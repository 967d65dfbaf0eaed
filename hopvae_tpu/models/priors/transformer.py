"""Causal-Transformer prior over the discrete latent grid.

A third prior family with no reference counterpart (the reference ships
``Normal`` and an absent-submodule PixelCNN — ``/root/reference/utils/
__init__.py:71-82``): it exists to prove the prior protocol
(``models/priors/__init__.py``) is genuinely pluggable, and because a
decoder-only transformer is the modern default for AR priors.

AR order matches the PixelCNN prior exactly — raster over (i, j) with the
channel chain innermost — so the flattened sequence index is
``p = (i·r + j)·C + c`` and sequence length is ``S = r²·C``.

TPU-first choices:

- training forward = causal attention for all S positions at once
  (MXU-friendly (B,S,d) matmuls).  Three interchangeable attention
  backends (``ops/attention.py``), selected by ``prior_attn``:
  ``"dense"`` (one fused pass, (B, heads, S, S) scores — fastest at
  small S), ``"blocked"`` (flash-style online-softmax over KV blocks in
  XLA, O(S·block) memory), ``"flash"`` (the Mosaic flash-attention
  kernel — the fast path on TPU at large S; falls back to blocked
  off-TPU), or ``"auto"`` (default: flash once S ≥ 512).  On TPU prefer
  ``prior_heads=1`` (dh=128, one full MXU contraction) at the large
  grids: measured 5.1× the blocked/heads=4 fwd+bwd at r=33;
- sampling = one ``lax.scan`` over the S positions with preallocated
  per-layer K/V caches updated by ``dynamic_update_slice`` — no
  recomputation, no host round-trips; the same step function runs
  teacher-forced in ``decode_logits`` so cache correctness is testable
  against the dense forward without stochastic flakiness;
- optional grouped-query attention (``prior_kv_heads`` < ``prior_heads``,
  down to multi-query at 1): K/V are projected to ``kv_heads`` heads and
  each serves a group of ``heads/kv_heads`` query heads.  Training cost
  is unchanged (K/V are broadcast back to ``heads`` for the batched
  backends; same matmul shapes).  Whether MQA pays is a LANE-WIDTH
  question, measured on the v5e (``tools/gqa_decode_bench.py``,
  2026-08-17): at the default d=128 (dh=32) it is a **dead end** — 3.7×
  slower at r=8 (3,497-3,505 vs 12,949 samples/s) and 1.22× slower at
  r=17 (629-636 vs 778) across three formulations (grouped einsum,
  flattened 3D cache, dedicated shared-KV einsum), because a (B, S, 32)
  cache still pads to the 128-lane tile — no physical bytes are saved
  while the tiny per-head matmuls get less efficient.  At d=512 (dh=128,
  one head exactly lane-wide) MQA decode is **4.66× faster** (9,620 vs
  2,066 samples/s, r=8 batch 512) — the full byte cut materializes.
  Rule: ``prior_kv_heads < heads`` only pays when dh = d/heads ≥ 128.
- **speculative self-drafting decode: measured DEAD END at every shipped
  geometry** (implementation at commit e6e1017, removed after
  measurement; full write-up in BASELINE.md "r=33 transformer-decode
  roofline").  Exact windowed-draft + chunked-full-cache-verify
  rejection sampling: the acceptance model held (0.84/0.93/0.96 at
  W=99/297/512 on the trained FFHQ-128 checkpoint → 5.35-9.0 tokens per
  verify round at k=8-16), but per-row desynchronized positions force
  every cache access through batched gather/scatter instead of
  ``dynamic_update_slice``, and a while-loop iteration costs ~4-6 ms
  vs the direct sampler's 0.9 ms — measured 8.0 samples/s vs 86.0
  direct at r=33 batch 256 (10.7× SLOWER), worse at every other
  (k, W).  Synchronizing rows to restore dynamic_update_slice collapses
  E[tokens/round] → ~1 at batch 256 (min over 256 geometric acceptance
  draws), so the overhead is structural to batched speculative decode
  at these per-step costs, not a tuning artifact.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from hopvae_tpu.ops.attention import (
    blocked_causal_attention,
    dense_causal_attention,
    flash_causal_attention,
)
from hopvae_tpu.ops.hopfield import layer_norm

# past this sequence length, "auto" leaves the dense backend: at S=512
# the dense score tensor is already B·heads·S²·4B ≈ 268 MB at batch 64 —
# and it is saved per layer for the backward — while flash/blocked hold
# one block tile. Auto picks the Mosaic flash kernel (which falls back
# to blocked off-TPU), or blocked directly for head dims the kernel
# rejects (dh > 128 and not a multiple of 128).
_AUTO_STREAMING_SEQ = 512


def _ln(x, p):
    return layer_norm(x, p["scale"], p["bias"])


def _quantize_token(x, kv, qmax=127.0, dtype=jnp.int8):
    """Per-(token, kv-head) absmax quantization: (B, kv·dh) → (codes
    (B, kv·dh) in ``dtype``, scales f32 (B, kv)).  One scale PER HEAD — a
    single per-token scale would crush a head whose activations are
    dwarfed by another's on trained checkpoints (review finding).
    ``qmax=127`` int8 is the production option; ``qmax=7`` int4 is the
    experimental half-again byte cut."""
    b, w = x.shape
    xh = x.reshape(b, kv, w // kv)
    s = jnp.maximum(jnp.max(jnp.abs(xh), axis=-1) / qmax, 1e-12)
    q = jnp.clip(jnp.round(xh / s[..., None]), -qmax, qmax).astype(dtype)
    return q.reshape(b, w), s.astype(jnp.float32)


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


class TransformerPrior:
    """Decoder-only transformer over an ``(B, r, r, index_dim)`` level grid."""

    has_params = True

    def __init__(self, config):
        self.index_dim = config.index_dim
        self.representation_dim = config.representation_dim
        self.num_levels = config.num_levels
        self.d = getattr(config, "prior_d_model", 128)
        self.heads = getattr(config, "prior_heads", 4)
        self.n_layers = getattr(config, "prior_layers", 4)
        assert self.d % self.heads == 0, "prior_d_model must split into heads"
        self.kv_heads = int(getattr(config, "prior_kv_heads", self.heads))
        if not (1 <= self.kv_heads <= self.heads) or self.heads % self.kv_heads:
            raise ValueError(
                f"prior_kv_heads={self.kv_heads} must divide prior_heads={self.heads}"
            )
        if self.kv_heads < self.heads and self.d // self.heads < 128:
            # measured on v5e (module docstring): below one 128-lane tile
            # per head the cache still pads to full lanes, so GQA saves no
            # bytes and decodes slower.  warnings.warn so sweeps that build
            # many priors emit this once, not per construction
            import warnings

            warnings.warn(
                f"prior_kv_heads={self.kv_heads} < heads with head dim "
                f"{self.d // self.heads} < 128 — measured SLOWER on TPU (no "
                "physical cache-byte saving below one 128-lane tile per head)",
                stacklevel=2,
            )
        self.seq = self.representation_dim**2 * self.index_dim
        attn = getattr(config, "prior_attn", "auto")
        dh = self.d // self.heads
        if attn == "auto":
            if self.seq < _AUTO_STREAMING_SEQ:
                attn = "dense"
            elif dh <= 128 or dh % 128 == 0:
                # large grids: the Mosaic flash kernel (which itself
                # falls back to blocked off-TPU, ops/attention.py) —
                # never dense's (B, h, S, S) materialization
                attn = "flash"
            else:
                # the kernel rejects head dims > 128 that aren't 128-multiples
                attn = "blocked"
        if attn not in ("dense", "blocked", "flash"):
            raise ValueError(f"prior_attn must be auto|dense|blocked|flash, got {attn!r}")
        if attn == "dense" and self.seq >= 1024:
            # per-sample dense score memory: heads·S²·4B per layer, saved
            # for the backward — at S=3267 that is ~171 MB/sample/layer
            print(
                f"warning: prior_attn=dense at S={self.seq} materializes "
                f"{self.heads * self.seq**2 * 4 / 2**20:.0f} MiB of attention "
                "scores per sample per layer (training OOM risk) — use "
                "prior_attn=flash (the auto default at this size)",
                file=sys.stderr,
            )
        self.attn = attn
        self.q_block = getattr(config, "prior_q_block", 256)
        self.kv_block = getattr(config, "prior_kv_block", 256)
        cdt = str(getattr(config, "prior_cache_dtype", "auto"))
        if cdt == "auto":
            # int8 K/V caches are the r>=17 default (round-4 decision): the
            # decode step is ~90% cache-read bound there and int8 is the
            # measured 1.43-1.51x win at ZERO quality cost on the trained
            # checkpoints (r=33 teacher-forced bits 0.62024 f32 vs 0.62043
            # int8; logit drift 3.6% of max — BASELINE.md).  Small grids
            # keep bf16 (int8's dequant overhead isn't paid back at r=8).
            cdt = "int8" if self.seq >= _AUTO_STREAMING_SEQ else "bfloat16"
        if cdt in ("bfloat16", "bf16"):
            self.cache_dtype = jnp.bfloat16
        elif cdt == "int8":
            # per-(token, kv-head) absmax-quantized K/V caches: halves the
            # decode's cache bytes again vs bf16 (the step is ~90%
            # cache-read bound at r>=17); scores/outputs dequantize via
            # the scale side-caches
            self.cache_dtype = jnp.int8
        elif cdt == "int4":
            # EXPERIMENTAL: native XLA S4 storage, per-(token, kv-head)
            # absmax to ±7.  Measured on the v5e (2026-08-18,
            # tools/int4_decode_bench.py): S4 DOES pack two codes/byte in
            # HBM and decode is 1.32× int8 at r=33 (112.5 vs 85.3
            # samples/s) — but 15-level codes are quality-infeasible on
            # trained checkpoints (held-out bits 0.620 → 0.667, logit err
            # 58.5% of max; BASELINE.md).  int8 stays the recommendation.
            self.cache_dtype = jnp.int4
        elif cdt in ("float32", "f32"):
            self.cache_dtype = jnp.float32
        else:
            raise ValueError(
                f"prior_cache_dtype must be float32|bfloat16|int8|int4, got {cdt!r}"
            )
        # AR-decode segment length (growing-cache scan, see _decode_all).
        # Measured 2026-08-17 (v5e): r=8/batch-1024 12,982 samples/s at
        # seg=64 vs 9,064 unsegmented; r=17/batch-2048 778 at seg=128 vs
        # 460.  Finer segments win until compile cost explodes (seg=64 at
        # S=867 is 14 scan bodies).
        self.decode_segment = getattr(
            config, "prior_decode_segment", 64 if self.seq <= 256 else 128
        )

    # ------------------------------------------------------------- params

    def init(self, key) -> dict:
        d, s, lvl = self.d, self.seq, self.num_levels
        keys = jax.random.split(key, 4 + 4 * self.n_layers)
        scale = 0.02

        def dense(k, fan_in, fan_out):
            return {
                "kernel": scale * jax.random.normal(k, (fan_in, fan_out)),
                "bias": jnp.zeros((fan_out,)),
            }

        kv_width = self.kv_heads * (d // self.heads)
        return {
            "tok_emb": scale * jax.random.normal(keys[0], (lvl, d)),
            "bos": scale * jax.random.normal(keys[1], (d,)),
            "pos_emb": scale * jax.random.normal(keys[2], (s, d)),
            "blocks": [
                {
                    "ln1": _ln_init(d),
                    "qkv": dense(keys[3 + 4 * i], d, d + 2 * kv_width),
                    "out": dense(keys[4 + 4 * i], d, d),
                    "ln2": _ln_init(d),
                    "mlp_in": dense(keys[5 + 4 * i], d, 4 * d),
                    "mlp_out": dense(keys[6 + 4 * i], 4 * d, d),
                }
                for i in range(self.n_layers)
            ],
            "ln_f": _ln_init(d),
            "head": dense(keys[-1], d, lvl),
        }

    # ------------------------------------------------------------ forward

    def _embed_inputs(self, params, tokens):
        """Shift-right embedding: position p's input is token p-1 (BOS at 0)."""
        b, s = tokens.shape
        emb = params["tok_emb"][tokens[:, :-1]]  # (B, S-1, d)
        bos = jnp.broadcast_to(params["bos"], (b, 1, self.d))
        return jnp.concatenate([bos, emb], axis=1) + params["pos_emb"][None, :s]

    def _split_qkv(self, p, x):
        """Project and split into q (…, heads·dh), k/v (…, kv_heads·dh)."""
        d, dh = self.d, self.d // self.heads
        kvw = self.kv_heads * dh
        qkv = _ln(x, p["ln1"]) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        return qkv[..., :d], qkv[..., d : d + kvw], qkv[..., d + kvw :]

    def _block(self, p, x):
        """Pre-LN block; causal attention via the configured backend."""
        b, s, d = x.shape
        h, dh, kv = self.heads, d // self.heads, self.kv_heads
        q, k, v = self._split_qkv(p, x)
        q = q.reshape(b, s, h, dh)
        k = k.reshape(b, s, kv, dh)
        v = v.reshape(b, s, kv, dh)
        if kv != h:
            # broadcast each KV head over its query group for the batched
            # training backends — GQA's byte saving is a DECODE property
            # (cache reads); training matmul shapes stay identical
            k = jnp.repeat(k, h // kv, axis=2)
            v = jnp.repeat(v, h // kv, axis=2)
        if self.attn == "blocked":
            y = blocked_causal_attention(
                q, k, v, q_block=self.q_block, kv_block=self.kv_block
            )
        elif self.attn == "flash":
            y = flash_causal_attention(q, k, v)
        else:
            y = dense_causal_attention(q, k, v)
        y = y.reshape(b, s, d)
        x = x + y @ p["out"]["kernel"] + p["out"]["bias"]
        z = _ln(x, p["ln2"])
        z = jax.nn.gelu(z @ p["mlp_in"]["kernel"] + p["mlp_in"]["bias"])
        return x + z @ p["mlp_out"]["kernel"] + p["mlp_out"]["bias"]

    def forward(self, params, grid: jax.Array) -> jax.Array:
        """Level grid (B, r, r, C) [0, L-1] floats → logits (B, r, r, C, L)."""
        # msgpack-loaded params arrive as numpy; numpy fancy-indexing by a
        # traced index (the embedding gathers) raises — coerce to jnp once
        params = jax.tree_util.tree_map(jnp.asarray, params)
        b, r, c = grid.shape[0], self.representation_dim, self.index_dim
        tokens = grid.astype(jnp.int32).reshape(b, self.seq)
        x = self._embed_inputs(params, tokens)
        for blk in params["blocks"]:
            x = self._block(blk, x)
        logits = _ln(x, params["ln_f"]) @ params["head"]["kernel"] + params["head"]["bias"]
        return logits.reshape(b, r, r, c, self.num_levels)

    # ------------------------------------------------------------- decode
    #
    # One scan step: given the embedded input for position t and K/V caches
    # holding positions < t, return position t's logits and updated caches.
    # Shared by the sampler and the teacher-forced `decode_logits` (the
    # cache-correctness test surface).
    #
    # Decode-speed notes (measured on the v5e, 2026-08-17/18): the step is
    # HBM-bound on reading the caches, so ``prior_cache_dtype`` defaults
    # to bfloat16 for :meth:`sample` (halves the bytes; scores/softmax
    # still accumulate f32) while ``decode_logits`` pins f32 caches to
    # keep the cache-vs-dense exactness gate tight.
    # ``prior_cache_dtype="int8"`` (per-(token, kv-head) absmax K/V
    # with (B, S, kv) scale side-caches) halves the bytes again: 1,173
    # vs 778 samples/s at r=17 batch 2048 (1.51×) and 85.3 vs 59.5 at
    # r=33 batch 256 (1.43×), at 1.6%-of-max logit error on the trained
    # MNIST checkpoint and 3.6% on the trained FFHQ-128 one with ZERO
    # teacher-forced bits drift (0.62024 vs 0.62043 — BASELINE.md; both
    # bench-gated; per-TOKEN scales were 6% faster but risk crushing a
    # small head on trained models).  int8 is therefore the AUTO default
    # at S≥512 since round 4; bf16 below.  A block-structured
    # cache with a ``lax.cond``-skipped inner scan (read only the valid
    # prefix) was measured 3.6× SLOWER at r=8 (1.3k vs 4.8k samples/s,
    # batch 1024) — per-iteration loop/branch overhead dwarfs the ~2×
    # average bandwidth saving at these sequence lengths; do not
    # re-attempt without new evidence.  Casting the two cache-sized
    # einsums to bf16 operands (f32 accumulate) to raise the MXU rate was
    # measured a NO-OP at r=33 (2026-08-19: 59.1/103.1 samples/s vs
    # 59.2/103.2 for the f32 dots, both batches, both cache dtypes) — at
    # decode shapes the dots are a rounding error next to the cache read
    # and the dequant-convert VPU work, so the f32 dots stay (tighter
    # numerics for free); don't re-attempt that either.

    def _decode_step(self, params, caches, x_t, t):
        """x_t (B, d) input embedding for position t → (caches', logits (B, L))."""
        h, dh, kv = self.heads, self.d // self.heads, self.kv_heads
        g = h // kv  # query heads per KV head (1 unless GQA/MQA)
        b = x_t.shape[0]
        new_caches = []
        x = x_t
        for p, cache in zip(params["blocks"], caches):
            q, kk, vv = self._split_qkv(p, x)
            cdt = cache["k"].dtype
            quantized = cdt in (jnp.int8, jnp.int4)
            new_cache = {}
            if quantized:
                # per-(token, kv-head) absmax quantization; the scales
                # live in tiny (B, S, kv) side caches, folded back below
                qmax = 127.0 if cdt == jnp.int8 else 7.0
                kk, sk = _quantize_token(kk, kv, qmax=qmax, dtype=cdt)
                vv, sv = _quantize_token(vv, kv, qmax=qmax, dtype=cdt)
                new_cache["ks"] = jax.lax.dynamic_update_slice(
                    cache["ks"], sk[:, None, :], (0, t, 0)
                )
                new_cache["vs"] = jax.lax.dynamic_update_slice(
                    cache["vs"], sv[:, None, :], (0, t, 0)
                )
            if kv == 1:
                # MQA: a 3D (B, S, dh) cache and a single shared-KV einsum —
                # no singleton batch dim for the compiler to trip over
                k_cache = jax.lax.dynamic_update_slice(
                    cache["k"], kk.reshape(b, 1, dh).astype(cdt), (0, t, 0)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    cache["v"], vv.reshape(b, 1, dh).astype(cdt), (0, t, 0)
                )
                q = q.reshape(b, h, dh)
                qk, av = "bhd,bsd->bhs", "bhs,bsd->bhd"
            else:
                k_cache = jax.lax.dynamic_update_slice(
                    cache["k"], kk.reshape(b, 1, kv, dh).astype(cdt), (0, t, 0, 0)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    cache["v"], vv.reshape(b, 1, kv, dh).astype(cdt), (0, t, 0, 0)
                )
                q = q.reshape(b, kv, g, dh)
                qk, av = "bkgd,bskd->bkgs", "bkgs,bskd->bkgd"
            new_cache["k"], new_cache["v"] = k_cache, v_cache
            new_caches.append(new_cache)
            scores = jnp.einsum(
                qk, q, k_cache.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(float(dh))
            def _scale(sc):  # (B, S, kv) → broadcastable over the scores
                if kv == 1:  # scores (B, h, S)
                    return sc[..., 0][:, None, :]
                return jnp.swapaxes(sc, 1, 2)[:, :, None, :]  # (B, kv, 1, S)

            if quantized:
                scores = scores * _scale(new_cache["ks"])
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1) <= t
            )
            att = jax.nn.softmax(jnp.where(valid, scores, -1e30), axis=-1)
            if quantized:
                att = att * _scale(new_cache["vs"])
            y = jnp.einsum(
                av, att.astype(q.dtype), v_cache.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(b, self.d)
            x = x + y @ p["out"]["kernel"] + p["out"]["bias"]
            z = _ln(x, p["ln2"])
            z = jax.nn.gelu(z @ p["mlp_in"]["kernel"] + p["mlp_in"]["bias"])
            x = x + z @ p["mlp_out"]["kernel"] + p["mlp_out"]["bias"]
        logits = _ln(x, params["ln_f"]) @ params["head"]["kernel"] + params["head"]["bias"]
        return new_caches, logits

    def _empty_caches(self, b, dtype=jnp.float32, length: int | None = None):
        kv, dh = self.kv_heads, self.d // self.heads
        length = self.seq if length is None else length
        shape = (b, length, dh) if kv == 1 else (b, length, kv, dh)
        one = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        if dtype in (jnp.int8, jnp.int4):  # per-(token, kv-head) dequantization scales
            one["ks"] = jnp.zeros((b, length, kv), jnp.float32)
            one["vs"] = jnp.zeros((b, length, kv), jnp.float32)
        return [dict(one) for _ in range(self.n_layers)]

    def _decode_all(self, params, b, x_of, emit, extra_init, cache_dtype):
        """AR decode over all S positions as ``nb`` growing-cache segments.

        The decode step is HBM-bound on reading the caches, and a fixed
        full-length cache reads S·(bytes/token) EVERY step.  Segment k
        (positions [kT, min((k+1)T, S))) instead scans with a cache of
        STATIC length min((k+1)T, S) — grown by concatenation between
        segments — so the average step reads ~(S+T)/2 tokens instead of
        S.  No dynamic branching (a per-step ``lax.cond`` block-skip was
        measured 3.6× slower); just nb statically-shaped scans.

        ``x_of(extra, t) -> (B, d)`` produces the step input;
        ``emit(extra, t, logits) -> (extra', out)`` consumes the step
        logits.  Returns the stacked outs over all S positions.
        """
        s, T = self.seq, min(self.decode_segment, self.seq)
        nb = -(-s // T)
        caches = self._empty_caches(b, cache_dtype, length=min(T, s))
        extra = extra_init
        outs = []
        for k in range(nb):
            if k:
                grow = min((k + 1) * T, s) - k * T
                caches = [
                    {
                        name: jnp.concatenate(
                            [arr, jnp.zeros((b, grow) + arr.shape[2:], arr.dtype)],
                            axis=1,
                        )
                        for name, arr in c.items()
                    }
                    for c in caches
                ]

            def seg_body(carry, t):
                caches, extra = carry
                caches, logits = self._decode_step(params, caches, x_of(extra, t), t)
                extra, out = emit(extra, t, logits)
                return (caches, extra), out

            (caches, extra), seg_outs = jax.lax.scan(
                seg_body, (caches, extra), jnp.arange(k * T, min((k + 1) * T, s))
            )
            outs.append(seg_outs)
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def sample(self, params, key: jax.Array, num_samples: int = 1) -> jax.Array:
        """KV-cached AR draw — segmented scan over the S positions."""
        params = jax.tree_util.tree_map(jnp.asarray, params)  # see forward
        b = num_samples

        def x_of(tok_prev, t):
            return jnp.where(
                t == 0,
                jnp.broadcast_to(params["bos"], (b, self.d)),
                params["tok_emb"][tok_prev],
            ) + params["pos_emb"][t]

        def emit(tok_prev, t, logits):
            draw = jax.random.categorical(jax.random.fold_in(key, t), logits, axis=-1)
            return draw, draw

        draws = self._decode_all(
            params, b, x_of, emit, jnp.zeros((b,), jnp.int32), self.cache_dtype
        )
        grid = draws.T.reshape(b, self.representation_dim, self.representation_dim, self.index_dim)
        return grid.astype(jnp.float32)

    def decode_logits(self, params, grid: jax.Array, cache_dtype=jnp.float32) -> jax.Array:
        """Teacher-forced logits through the SAME KV-cached decode path as
        :meth:`sample` — must match :meth:`forward` (cache-correctness
        gate; see tests).  Caches default to f32 so the gate stays tight;
        pass ``cache_dtype=jnp.int8`` to measure the quantized-cache
        path's logit error."""
        params = jax.tree_util.tree_map(jnp.asarray, params)  # see forward
        b = grid.shape[0]
        tokens = grid.astype(jnp.int32).reshape(b, self.seq)

        def x_of(extra, t):
            return jnp.where(
                t == 0,
                jnp.broadcast_to(params["bos"], (b, self.d)),
                params["tok_emb"][tokens[:, jnp.maximum(t - 1, 0)]],
            ) + params["pos_emb"][t]

        def emit(extra, t, logits):
            return extra, logits

        logits = self._decode_all(params, b, x_of, emit, jnp.zeros(()), cache_dtype)
        logits = jnp.moveaxis(logits, 0, 1)  # (B, S, L)
        return logits.reshape(
            b, self.representation_dim, self.representation_dim,
            self.index_dim, self.num_levels,
        )

    # --------------------------------------------------------- protocol

    def reconstruct(self, params, grid: jax.Array) -> jax.Array:
        """Teacher-forced denoise: argmax re-prediction per position (same
        contract as the PixelCNN prior)."""
        logits = self.forward(params, grid)
        return jnp.argmax(logits, axis=-1).astype(grid.dtype)

    def interpolate(self, params, x: jax.Array, y: jax.Array) -> jax.Array:
        return (x + y) / 2
