"""Straight-through estimators.

The reference's ``straight_through_round`` (``utils/__init__.py:51-55``)
rounds in the forward pass and passes gradients through unchanged. The
JAX-native formulation uses ``stop_gradient`` instead of a ``.data`` swap —
identical value and identical (identity) VJP, but expressible inside ``jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def straight_through_round(x: jax.Array) -> jax.Array:
    """Forward: round-half-to-even (matches ``torch.round``). Backward: identity."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
