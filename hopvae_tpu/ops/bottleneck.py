"""The HopVAE latent bottleneck: three fused Hopfield lookups + quantize.

Reference semantics (``/root/reference/HopVAE.py:255-272``):

    e   = hopfield(x)                       # retrieval/denoise, d -> d
    i   = sigmoid(embedding_to_index(e))    # d -> index_dim
    zq  = ste_round(i * (L-1)); zn = zq/(L-1)
    r   = index_to_embedding(zn)            # index_dim -> d

Returns ``(e, zq, r)`` — the decoder input, the prior's integer grid, and
the round-trip reconstruction for ``embedding_recon_loss``.

Two implementations with one contract:

- ``impl="xla"``: pure-jnp reference (ops/hopfield.py lookups), fully
  differentiable, the parity anchor.
- ``impl="pallas"``: the streaming TPU kernels (ops/hopfield_pallas.py) —
  flash-style forward emitting softmax row stats, plus a fused Pallas
  backward that rebuilds the attention tile-by-tile from those stats (the
  (N, M) attention matrix never touches HBM in either direction). This is
  the production path for BOTH inference and training; gradients match
  the jnp reference to float-summation order (exact at
  ``Precision.HIGHEST`` — see tests/test_pallas.py and the bench-time
  on-hardware gates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hopvae_tpu.ops.hopfield import hopfield_lookup
from hopvae_tpu.ops.ste import straight_through_round


def bottleneck_params(params: dict) -> dict:
    """The three Hopfield sub-trees the bottleneck consumes."""
    return {
        "hopfield": params["hopfield"],
        "embedding_to_index": params["embedding_to_index"],
        "index_to_embedding": params["index_to_embedding"],
    }


def hopfield_bottleneck_xla(params: dict, x: jax.Array, num_levels: int):
    e = hopfield_lookup(params["hopfield"], x)
    i = jax.nn.sigmoid(hopfield_lookup(params["embedding_to_index"], e))
    zq = straight_through_round(i * (num_levels - 1))
    zn = zq / (num_levels - 1)
    r = hopfield_lookup(params["index_to_embedding"], zn)
    return e, zq, r


def hopfield_bottleneck(params: dict, x: jax.Array, num_levels: int, impl: str = "xla"):
    if impl == "pallas":
        from hopvae_tpu.ops.hopfield_pallas import hopfield_bottleneck_pallas

        return hopfield_bottleneck_pallas(params, x, num_levels)
    return hopfield_bottleneck_xla(params, x, num_levels)
