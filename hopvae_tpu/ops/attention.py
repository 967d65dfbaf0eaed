"""Blocked (flash-style) causal self-attention — pure JAX, XLA-scheduled.

Memory-bounded replacement for the Transformer prior's dense training
forward (``models/priors/transformer.py``), which materializes
``(B, heads, S, S)`` f32 scores — ~11 GB at the r=33 latent grid
(S = 33·33·3 = 3267) with batch 64.  This formulation never holds more
than one ``(B, heads, q_block, kv_block)`` score tile:

- outer ``lax.scan`` over query blocks, each wrapped in
  ``jax.checkpoint`` so the backward pass recomputes the block's
  probabilities instead of storing them (the standard flash-attention
  trade: ~1.3× forward FLOPs for O(S·block) residual memory);
- inner ``lax.scan`` over KV blocks carrying online-softmax statistics
  (running max ``m``, normalizer ``l``, weighted accumulator ``acc``) —
  the same streaming-softmax recurrence as the Hopfield pattern kernel
  (``ops/hopfield_pallas.py``), expressed at the XLA level so it runs
  identically on the CPU test mesh and the TPU;
- strictly-future KV blocks are skipped with ``lax.cond`` on a scalar
  block predicate — a real skip under ``scan`` (the predicate is not
  batch-dependent), recovering the ~2× causal FLOP saving that a
  mask-and-compute-everything formulation wastes.

Softmax statistics are kept in float32 regardless of the input dtype
(bf16 inputs stay bf16 through the QKᵀ / PV matmuls — MXU-native — while
the rescaling math that decides numerical correctness runs in f32).

The reference has no counterpart (no transformer anywhere in
``/root/reference``); this exists because the prior protocol
(``/root/reference/utils/__init__.py:71-82``) is pluggable and the
Transformer family must train at every latent geometry the framework
supports, not just r=8.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Finite stand-in for -inf: exp(x - m) underflows to exactly 0 for masked
# entries without the NaN risk of (-inf) - (-inf) in the m-update of rows
# whose first processed block is fully masked (padded query rows).
_NEG = -1e30


def blocked_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    q_block: int = 256,
    kv_block: int = 256,
    scale: float | None = None,
) -> jax.Array:
    """Causal ``softmax(QKᵀ·scale)V`` over ``(B, S, heads, dh)`` tensors.

    Equivalent to the dense masked formulation (see
    ``tests/test_transformer_prior.py::test_blocked_attention_matches_dense``)
    with peak score memory ``B·heads·q_block·kv_block`` instead of
    ``B·heads·S²``.  ``S`` need not divide the block sizes — inputs are
    zero-padded and the padded tail masked off / sliced away.
    """
    b, s, h, dh = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    q_block = min(q_block, max(s, 1))
    kv_block = min(kv_block, max(s, 1))
    nq = -(-s // q_block)
    nk = -(-s // kv_block)
    sq, sk = nq * q_block, nk * kv_block

    qp = jnp.pad(q, ((0, 0), (0, sq - s), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk - s), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk - s), (0, 0), (0, 0)))
    # scan carries the block axis in front: (nq, B, T, h, dh)
    qb = jnp.moveaxis(qp.reshape(b, nq, q_block, h, dh), 1, 0)
    kb = jnp.moveaxis(kp.reshape(b, nk, kv_block, h, dh), 1, 0)
    vb = jnp.moveaxis(vp.reshape(b, nk, kv_block, h, dh), 1, 0)

    q_off = jnp.arange(q_block)
    k_off = jnp.arange(kv_block)

    @jax.checkpoint
    def one_q_block(qi, i):
        """qi (B, Tq, h, dh), block index i → attention output (B, Tq, h, dh)."""
        q_pos = i * q_block + q_off  # (Tq,)

        def kv_step(carry, xs):
            kj, vj, j = xs

            def attend(carry):
                acc, m, l = carry
                # (B, h, Tq, Tk) — the only score tile ever live
                sc = jnp.einsum(
                    "bqhd,bkhd->bhqk", qi, kj,
                    preferred_element_type=jnp.float32,
                ) * scale
                k_pos = j * kv_block + k_off
                mask = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < s)
                sc = jnp.where(mask[None, None], sc, _NEG)
                m_new = jnp.maximum(m, sc.max(axis=-1))
                p = jnp.exp(sc - m_new[..., None])
                # kill the exp(NEG - NEG) = 1 ghosts of fully-masked rows
                p = jnp.where(mask[None, None], p, 0.0)
                corr = jnp.exp(m - m_new)
                l_new = l * corr + p.sum(axis=-1)
                pv = jnp.einsum(
                    "bhqk,bkhd->bhqd", p.astype(vj.dtype), vj,
                    preferred_element_type=jnp.float32,
                )
                acc_new = acc * corr[..., None] + pv
                return acc_new, m_new, l_new

            # scalar predicate → lax.cond is a genuine skip of future blocks
            carry = jax.lax.cond(
                j * kv_block <= i * q_block + (q_block - 1),
                attend,
                lambda c: c,
                carry,
            )
            return carry, None

        init = (
            jnp.zeros((b, h, q_block, dh), jnp.float32),
            jnp.full((b, h, q_block), _NEG, jnp.float32),
            jnp.zeros((b, h, q_block), jnp.float32),
        )
        (acc, _, l), _ = jax.lax.scan(kv_step, init, (kb, vb, jnp.arange(nk)))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return jnp.moveaxis(out, 1, 2)  # (B, Tq, h, dh)

    def outer(_, xs):
        qi, i = xs
        return None, one_q_block(qi, i)

    _, blocks = jax.lax.scan(outer, None, (qb, jnp.arange(nq)))
    out = jnp.moveaxis(blocks, 0, 1).reshape(b, sq, h, dh)[:, :s]
    return out.astype(q.dtype)


def flash_causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float | None = None
) -> jax.Array:
    """TPU flash-attention backend: the Mosaic kernel from
    ``jax.experimental.pallas.ops.tpu.flash_attention`` (forward + its
    library custom-VJP backward), over the same ``(B, S, heads, dh)``
    layout as the other backends.

    The kernel wants S divisible by its 128-wide blocks; zero-padding the
    END of the sequence is *exact* under causal masking — no real query
    (position < S) can attend a padded key (position ≥ S), and padded
    query rows are sliced away.

    Measured (v5e, 2026-08-17, fwd+bwd at B=64, S=3267, d=128): 1.2×
    the blocked XLA backend at heads=4 (207 vs 252 ms/iter) and **5.1×**
    at heads=1 (49.7 ms) — dh=128 fills the MXU's contraction width
    where dh=32 runs it at a quarter; prefer ``prior_heads=1`` on TPU at
    the large grids.  Memory: the kernel pads dh to its 128-wide blocks,
    so at dh=32 its training residuals cost ~1.9× the blocked backend's
    (13.6 vs 7.1 GiB XLA temp at r=33 batch 64, ``tools/attn_memory.py``)
    while at dh=128 they are ~equal (5.85 vs 5.09 GiB) — pick blocked
    only when a small-head config is memory-bound.  Off-TPU (the CPU
    test mesh) this transparently falls back to
    :func:`blocked_causal_attention` — same math, same tolerances.
    """
    b, s, h, dh = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    if jax.default_backend() != "tpu":
        return blocked_causal_attention(q, k, v, scale=scale)
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    sp = -(-s // 128) * 128
    pad = ((0, 0), (0, sp - s), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad).swapaxes(1, 2) for t in (q, k, v))
    out = flash_attention(qp, kp, vp, causal=True, sm_scale=scale)
    return out.swapaxes(1, 2)[:, :s].astype(q.dtype)


def dense_causal_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale=None) -> jax.Array:
    """One-shot masked attention over ``(B, S, h, dh)`` — materializes the
    full ``(B, h, S, S)`` score tensor.  Fastest at small S (one fused
    launch, no scan overhead); memory-infeasible at large S."""
    b, s, h, dh = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) <= (
        jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    )
    scores = jnp.where(mask[None, None], scores, _NEG)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", att.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
