"""Modern-Hopfield lookup: softmax attention over a learned pattern memory.

Re-derivation of the semantics of ``hflayers.HopfieldLayer`` ("Hopfield
Networks is All You Need", arXiv 2008.02217) as instantiated by the
reference at ``/root/reference/HopVAE.py:149-170``:
``quantity=num_embeddings``, ``stored_pattern_as_static=True``,
``state_pattern_as_static=True``, all other arguments default.

With static state/stored patterns, a single head, and a single association
step, the layer degenerates to one cross-attention over a *parameter*
memory (no Q/K projections — they are identity; only the value path is
projected). The shipped checkpoint (``checkpoints/MNIST-28.ckpt``, see
SURVEY.md §2.6a/§2.7a) pins the parameter set per layer to exactly:

- ``lookup_weights`` ``(M, d_in)`` — stored patterns; serve as both the
  attention keys and the value-projection input
  (``lookup_weights_as_separated=False`` upstream default).
- ``in_proj`` ``d_in → d_in`` — the value projection (the only surviving
  part of the attention in-projection).
- ``out_proj`` ``d_in → d_out`` — readout projection.
- three affine LayerNorms over the pattern dim: stored / state / value
  (``normalize_{stored_pattern,state_pattern,pattern_projection}=True``
  upstream defaults).

Forward, for ``X ∈ (..., S, d_in)`` with ``β = 1 / sqrt(d_in)``
(single-head default scaling):

    K   = LN_stored(P)                    # (M, d_in)
    Q   = LN_state(X)                     # (..., S, d_in)
    V   = LN_proj(P) @ W_in + b_in        # (M, d_in)
    A   = softmax(β · Q Kᵀ, axis=-1)      # (..., S, M)
    out = (A V) @ W_out + b_out           # (..., S, d_out)

Weight convention: kernels are stored JAX-style, ``y = x @ W + b`` with
``W ∈ (d_in, d_out)`` (the transpose of torch ``nn.Linear.weight``).

This is the *reference* (pure-jnp) path; the fused Pallas kernel in
``hopfield_pallas.py`` must match it to tolerance (checkpoint-parity gate,
SURVEY.md §7 step 6).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch nn.LayerNorm default

# f32 math must not silently demote to bf16 passes (parity gate); the perf
# path opts into bf16 explicitly via dtypes.
_PRECISION = jax.lax.Precision.HIGHEST


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """Affine LayerNorm over the last axis (torch semantics, eps=1e-5)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    return (x - mean) * inv * scale + bias


def hopfield_lookup(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Apply one Hopfield lookup layer to ``x ∈ (..., S, d_in)``.

    ``params`` pytree::

        lookup_weights: (M, d_in)
        in_proj:  {kernel: (d_in, d_in), bias: (d_in,)}
        out_proj: {kernel: (d_in, d_out), bias: (d_out,)}
        norm_stored / norm_state / norm_proj: {scale: (d_in,), bias: (d_in,)}
    """
    patterns = params["lookup_weights"]
    d_in = patterns.shape[-1]

    k = layer_norm(patterns, params["norm_stored"]["scale"], params["norm_stored"]["bias"])
    q = layer_norm(x, params["norm_state"]["scale"], params["norm_state"]["bias"])
    v = layer_norm(patterns, params["norm_proj"]["scale"], params["norm_proj"]["bias"])
    v = jnp.dot(v, params["in_proj"]["kernel"], precision=_PRECISION) + params["in_proj"]["bias"]

    beta = 1.0 / jnp.sqrt(jnp.asarray(d_in, dtype=x.dtype))
    scores = jnp.einsum("...sd,md->...sm", q, k, precision=_PRECISION) * beta
    attn = jax.nn.softmax(scores, axis=-1)
    readout = jnp.einsum("...sm,md->...sd", attn, v, precision=_PRECISION)
    return jnp.dot(readout, params["out_proj"]["kernel"], precision=_PRECISION) + params["out_proj"]["bias"]


def init_hopfield_params(
    key: jax.Array, d_in: int, d_out: int, quantity: int, dtype=jnp.float32
) -> dict:
    """Fresh parameters for one Hopfield lookup layer.

    Init choices (documented divergence — the reference relies on upstream
    hflayers/torch-MHA init, which we approximate): patterns ~ N(0, 1)
    (torch MHA xavier-normal-ish for an (M, d) parameter memory),
    in/out projections xavier-uniform, LayerNorms at identity.
    """
    k_pat, k_in, k_out = jax.random.split(key, 3)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        "lookup_weights": jax.random.normal(k_pat, (quantity, d_in), dtype),
        "in_proj": {
            "kernel": xavier(k_in, (d_in, d_in), dtype),
            "bias": jnp.zeros((d_in,), dtype),
        },
        "out_proj": {
            "kernel": xavier(k_out, (d_in, d_out), dtype),
            "bias": jnp.zeros((d_out,), dtype),
        },
        "norm_stored": {"scale": jnp.ones((d_in,), dtype), "bias": jnp.zeros((d_in,), dtype)},
        "norm_state": {"scale": jnp.ones((d_in,), dtype), "bias": jnp.zeros((d_in,), dtype)},
        "norm_proj": {"scale": jnp.ones((d_in,), dtype), "bias": jnp.zeros((d_in,), dtype)},
    }
