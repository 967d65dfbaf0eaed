"""Trivial uniform-noise prior (the reference's ``Normal`` stub).

Parity with ``/root/reference/utils/__init__.py:18-34``: ``sample`` draws
uniform noise scaled by ``num_levels`` and truncated to ints downstream;
``reconstruct`` is identity; ``interpolate`` averages. Divergence
(documented): the reference's ``Normal.forward`` crashes on an unset
``self.num_levels`` (SURVEY.md §2.10); ours returns well-formed uniform
logits instead.

Grid layout is JAX-native ``(B, r, r, index_dim)`` (the reference uses
NCHW); values are float-typed integer levels in ``[0, num_levels)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class NormalPrior:
    has_params = False

    def __init__(self, config):
        self.index_dim = config.index_dim
        self.representation_dim = config.representation_dim
        self.num_levels = config.num_levels

    def init(self, key) -> dict:
        return {}

    def forward(self, params, grid: jax.Array) -> jax.Array:
        """Uniform random logits ``(B, r, r, C, num_levels)`` under a fixed
        key — a stub, like the reference's (which crashes; SURVEY §2.10)."""
        key = jax.random.PRNGKey(0)
        b = grid.shape[0]
        r = self.representation_dim
        return jax.random.uniform(key, (b, r, r, self.index_dim, self.num_levels), grid.dtype)

    def sample(self, params, key: jax.Array, num_samples: int = 1) -> jax.Array:
        """Float grid of integer levels: ``floor(U[0,1) * num_levels)``
        (matches ``rand()*num_levels`` then ``.type(int64)`` at
        ``HopVAE.py:188``)."""
        r = self.representation_dim
        u = jax.random.uniform(key, (num_samples, r, r, self.index_dim))
        return jnp.floor(u * self.num_levels)

    def reconstruct(self, params, grid: jax.Array) -> jax.Array:
        return grid

    def interpolate(self, params, x: jax.Array, y: jax.Array) -> jax.Array:
        return (x + y) / 2
