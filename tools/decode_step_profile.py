"""Decompose the r=33 transformer decode step's time on the TPU.

BASELINE.md's roofline table (round 4) shows the int8 decode at 66.4% of
the cache-read roofline with a ~1.0 s non-read residual over the 3267
steps (~0.3 ms/step).  Before building a fused Pallas flash-decode kernel
(VERDICT-r3 item 5's remaining suggestion), measure where that residual
actually is:

  step     — the production ``_decode_step`` (4 layers + MLPs + head)
             inside a T-step ``lax.scan`` at STATIC cache length L,
             exactly the per-segment structure of ``_decode_all``
  attn     — ONE layer's attention core only (cache update + scores +
             mask/softmax + AV + dequant folds), same scan harness
  attn_mxu — the same core but QK and AV consume the int8 codes DIRECTLY
             via int8 x int8 -> int32 MXU dots (q/att quantized per step),
             eliminating the K/V upcast converts entirely
  read     — pure cache traversal (sum both caches + scales): the
             measured bandwidth ceiling for anything that reads the cache

Geometry: the shipped FFHQ-128 checkpoint's (d=128, 4 layers, kv=4,
dh=32), B=256, at L=1697 (the segmented decode's mean cache length) and
L=3267 (the last segment).  All timings are chained-``fori_loop`` device
seconds (sub-ms steps — the harness regime, see utils/benchmark.py).
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior, _quantize_token
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    print("device:", jax.devices()[0])

    B, T = 256, 64
    cfg = load_config("ffhq_128")
    cfg.prior = "Transformer"
    cfg.representation_dim = 33
    cfg.num_levels = 512
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))
    kv, dh = prior.kv_heads, prior.d // prior.heads
    key = jax.random.PRNGKey(1)

    def scan_time(step_fn, init, label, iters=3):
        """Seconds per single step: T scan steps per harness iteration."""

        def one(carry):
            carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(T))
            return carry

        dt = device_seconds_per_iter(one, init, iters=iters) / T
        print(f"{label}: {dt * 1e3:.4f} ms/step")
        return dt

    for L in (1697, 3267):
        print(f"--- L={L}  (B={B}, d=128, 4 layers, kv=4, dh=32) ---")
        t0 = L // 2  # steady-state position: full mask work, mid-cache write

        # -- production step (all 4 layers + MLPs + LN + head) ------------
        caches = prior._empty_caches(B, jnp.int8, length=L)
        x0 = jax.random.normal(key, (B, prior.d), jnp.float32)

        def full_step(carry, i, t0=t0):
            caches, x = carry
            caches, logits = prior._decode_step(params, caches, x, t0)
            # feed logits back so nothing is dead
            return (caches, x + logits[:, : prior.d] * 1e-6), ()

        dt_step = scan_time(full_step, (caches, x0), "step(int8, production)")

        # -- single-layer attention cores ---------------------------------
        p0 = params["blocks"][0]
        q0 = jax.random.normal(key, (B, kv, 1, dh), jnp.float32)
        kk0 = jax.random.normal(jax.random.fold_in(key, 1), (B, kv * dh), jnp.float32)

        def attn_init(cdt):
            shape = (B, L, kv, dh)
            c = {"k": jnp.zeros(shape, cdt), "v": jnp.zeros(shape, cdt)}
            if cdt == jnp.int8:
                c["ks"] = jnp.zeros((B, L, kv), jnp.float32)
                c["vs"] = jnp.zeros((B, L, kv), jnp.float32)
            return c

        def attn_core(carry, i, cdt, mxu, t0=t0):
            """One layer's attention over the cache; no MLP/head."""
            cache, q, kk = carry
            new = {}
            if cdt == jnp.int8:
                kq, sk = _quantize_token(kk, kv)
                vq, sv = _quantize_token(kk, kv)
                new["ks"] = jax.lax.dynamic_update_slice(cache["ks"], sk[:, None, :], (0, t0, 0))
                new["vs"] = jax.lax.dynamic_update_slice(cache["vs"], sv[:, None, :], (0, t0, 0))
                upd = kq
            else:
                upd = kk.astype(cdt)
            new["k"] = jax.lax.dynamic_update_slice(
                cache["k"], upd.reshape(B, 1, kv, dh).astype(cdt), (0, t0, 0, 0)
            )
            new["v"] = jax.lax.dynamic_update_slice(
                cache["v"], upd.reshape(B, 1, kv, dh).astype(cdt), (0, t0, 0, 0)
            )
            if mxu == "int8":
                # int8 x int8 -> int32 on the MXU: quantize q per (row, head)
                qi, sq = _quantize_token(q.reshape(B, kv * dh), kv)
                qi = qi.reshape(B, kv, 1, dh)
                scores = jnp.einsum(
                    "bkgd,bskd->bkgs", qi, new["k"],
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) / jnp.sqrt(float(dh))
                scores = scores * sq[:, :, None, None]  # fold back q's scale
            elif mxu == "bf16":
                # dequantize INTO bf16, not f32: the convert feeds a
                # native-rate bf16 MXU dot instead of a 1/8-rate f32 one
                scores = jnp.einsum(
                    "bkgd,bskd->bkgs", q.astype(jnp.bfloat16),
                    new["k"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(float(dh))
            else:
                scores = jnp.einsum(
                    "bkgd,bskd->bkgs", q, new["k"].astype(q.dtype),
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(float(dh))
            if cdt == jnp.int8:
                scores = scores * jnp.swapaxes(new["ks"], 1, 2)[:, :, None, :]
            valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3) <= t0
            att = jax.nn.softmax(jnp.where(valid, scores, -1e30), axis=-1)
            if cdt == jnp.int8:
                att = att * jnp.swapaxes(new["vs"], 1, 2)[:, :, None, :]
            if mxu == "int8":
                # att in [0,1]: fixed 1/127 scale keeps the int8 dot exact
                ai = jnp.clip(jnp.round(att * 127.0), 0, 127).astype(jnp.int8)
                y = jnp.einsum(
                    "bkgs,bskd->bkgd", ai, new["v"],
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) / 127.0
            elif mxu == "bf16":
                y = jnp.einsum(
                    "bkgs,bskd->bkgd", att.astype(jnp.bfloat16),
                    new["v"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jnp.einsum(
                    "bkgs,bskd->bkgd", att.astype(q.dtype), new["v"].astype(q.dtype),
                    preferred_element_type=jnp.float32,
                )
            return (new, q + y * 1e-6, kk + y.reshape(B, kv * dh) * 1e-6), ()

        dt_attn = scan_time(
            functools.partial(attn_core, cdt=jnp.int8, mxu=None),
            (attn_init(jnp.int8), q0, kk0), "attn(int8, current f32 dot)")
        dt_mxu = scan_time(
            functools.partial(attn_core, cdt=jnp.int8, mxu="int8"),
            (attn_init(jnp.int8), q0, kk0), "attn(int8, MXU int8 dots)")
        dt_i8bf = scan_time(
            functools.partial(attn_core, cdt=jnp.int8, mxu="bf16"),
            (attn_init(jnp.int8), q0, kk0), "attn(int8, bf16 dots)")
        dt_bf16 = scan_time(
            functools.partial(attn_core, cdt=jnp.bfloat16, mxu=None),
            (attn_init(jnp.bfloat16), q0, kk0), "attn(bf16 cache, f32 dot)")

        # -- pure cache read ----------------------------------------------
        # the one-token write each step makes the cache carry vary, so the
        # sums below CANNOT be hoisted out of the scan (the first version
        # of this probe was loop-invariant and XLA hoisted it: 21 TB/s)
        c8 = attn_init(jnp.int8)

        def read_all(carry, i):
            cache, acc = carry
            cache = dict(cache)
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"],
                (i + acc).astype(jnp.int8).reshape(1, 1, 1, 1).repeat(kv, 2).repeat(dh, 3),
                (0, t0, 0, 0),
            )
            s = (
                jnp.sum(cache["k"], dtype=jnp.int32)
                + jnp.sum(cache["v"], dtype=jnp.int32)
                + jnp.sum(cache["ks"]).astype(jnp.int32)
                + jnp.sum(cache["vs"]).astype(jnp.int32)
            )
            return (cache, acc + s + i), ()

        dt_read = scan_time(read_all, (c8, jnp.int32(0)), "read(int8 caches+scales)")

        cache_bytes = B * L * kv * dh * 2 + B * L * kv * 4 * 2
        print(
            f"summary L={L}: step {dt_step*1e3:.4f} = 4x attn ({4*dt_attn*1e3:.4f}) "
            f"+ rest ({ (dt_step-4*dt_attn)*1e3:.4f}) ms; "
            f"read floor {dt_read*1e3:.4f} ms ({cache_bytes/dt_read/1e9:.0f} GB/s); "
            f"attn/read {dt_attn/dt_read:.2f}, mxu/read {dt_mxu/dt_read:.2f}, "
            f"i8bf16/read {dt_i8bf/dt_read:.2f}, bf16 attn {dt_bf16*1e3:.4f} ms"
        )


if __name__ == "__main__":
    main()
