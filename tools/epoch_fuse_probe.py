"""Isolate WHY a lax.scan-fused epoch measured 3.2x slower per step than
the chained-fori_loop harness step (train.py dead-end note).

Variants, all device-time via the two-length-slope method (dispatch
overhead cancels), FFHQ-64 production path (bf16 + Pallas), batch 256:

  A fori-fixed    harness baseline: fori_loop, same batch every step
  B scan-gather   scan over (K,B) idx, gather data[idx] in body, no ys
  C scan-gather+m scan as B but stacking the per-step metrics as ys
  D scan-xs       scan over pre-gathered (K,B,H,W,C) batches
  E fori-gather   fori_loop, gather data[idx[i]] in body (no scan ys)

If B ~= A the dead end was misattributed; C isolates metric stacking,
D isolates the gather.

Usage: python tools/epoch_fuse_probe.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hopvae_tpu import data as data_lib
    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE

    cfg = load_config("ffhq_64")
    cfg.batch_size = args.batch

    model = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)

    data = jnp.asarray(data_lib.synthetic_images(args.n, cfg.image_size, seed=0), jnp.float32)
    rng = np.random.default_rng(0)

    def loss_fn(p, x):
        xr, aux = model.forward(p, x)
        return jnp.mean((xr - x) ** 2) + aux, (jnp.mean((xr - x) ** 2), aux)

    def body(p, o, x):
        (loss, (recon, aux)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, {"loss": loss, "recon": recon, "aux": aux}

    def idx_for(k):
        return jnp.asarray(
            rng.integers(0, args.n, size=(k, args.batch)), jnp.int32
        )

    x_fixed = data[: args.batch]

    def probe(make_run, tag):
        runs = {k: make_run(k) for k in (args.iters, 2 * args.iters)}
        for r in runs.values():
            float(r())  # compile + land
        slopes = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(runs[args.iters]())
            t1 = time.perf_counter()
            float(runs[2 * args.iters]())
            t2 = time.perf_counter()
            s = ((t2 - t1) - (t1 - t0)) / args.iters
            if s > 0:
                slopes.append(s)
        slopes.sort()
        ms = slopes[len(slopes) // 2] * 1e3 if slopes else float("nan")
        print(f"{tag:14s} {ms:8.2f} ms/step  ({args.batch/ (ms/1e3):,.0f} img/s)")
        return ms

    # A: fori, fixed batch (harness baseline)
    def make_a(k):
        @jax.jit
        def run():
            def f(i, s):
                p, o = s
                p, o, _ = body(p, o, x_fixed)
                return (p, o)
            p, o = jax.lax.fori_loop(0, k, f, (params, opt0))
            return jnp.sum(p["pre_vq_conv"]["kernel"]) if "pre_vq_conv" in p else sum(
                jnp.sum(l) for l in jax.tree_util.tree_leaves(p)[:1]
            )
        return run

    # B: scan + on-device gather, metrics discarded
    def make_b(k):
        idx = idx_for(k)

        @jax.jit
        def run():
            def f(c, ib):
                p, o = c
                p, o, _ = body(p, o, data[ib])
                return (p, o), None
            (p, o), _ = jax.lax.scan(f, (params, opt0), idx)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)[:1])
        return run

    # C: scan + gather + stacked metric ys
    def make_c(k):
        idx = idx_for(k)

        @jax.jit
        def run():
            def f(c, ib):
                p, o = c
                p, o, m = body(p, o, data[ib])
                return (p, o), m
            (p, o), ms = jax.lax.scan(f, (params, opt0), idx)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)[:1]) + jnp.sum(ms["loss"])
        return run

    # D: scan over pre-gathered batches (no gather in body)
    def make_d(k):
        xs = data[np.asarray(idx_for(k))]

        @jax.jit
        def run():
            def f(c, x):
                p, o = c
                p, o, _ = body(p, o, x)
                return (p, o), None
            (p, o), _ = jax.lax.scan(f, (params, opt0), xs)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)[:1])
        return run

    # E: fori + gather
    def make_e(k):
        idx = idx_for(k)

        @jax.jit
        def run():
            def f(i, s):
                p, o = s
                p, o, _ = body(p, o, data[idx[i]])
                return (p, o)
            p, o = jax.lax.fori_loop(0, k, f, (params, opt0))
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)[:1])
        return run

    probe(make_a, "A fori-fixed")
    probe(make_b, "B scan-gather")
    probe(make_c, "C scan+metrics")
    probe(make_d, "D scan-xs")
    probe(make_e, "E fori-gather")


if __name__ == "__main__":
    main()
