"""Decompose the FFHQ-64 train step's device time: forward vs backward vs
optimizer, and per-module (encoder / decoder / bottleneck) fwd+VJP costs.

The VERDICT-r2 ask: attack the train-MFU gap (0.32 vs 0.57 recon) with a
measurement, not a paragraph. All numbers are pure device time via the
chained-``fori_loop`` harness (``utils/benchmark.py``).

Usage: python tools/train_profile.py [--batch 256] [--config ffhq_64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--config", default="ffhq_64")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.models.layers import decoder_apply, encoder_apply
    from hopvae_tpu.utils import flops as fl
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    cfg = load_config(args.config)
    model = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    b = args.batch
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, cfg.image_size, cfg.image_size, 3), np.float32)
    )
    tx = optax.adam(1e-3)
    out = {"config": args.config, "batch": b}

    def t(step_fn, state, iters=args.iters, repeats=4):
        return device_seconds_per_iter(step_fn, state, iters=iters, repeats=repeats)

    # 1. forward only (recon path)
    out["fwd_s"] = t(lambda s: model.forward(params, s)[0], x)

    # 2. forward + backward (value_and_grad), no optimizer — chain by
    #    nudging params with the grads so the loop carries real work
    def loss_fn(p, x):
        xr, aux = model.forward(p, x)
        return jnp.mean((xr - x) ** 2) + aux

    def fwdbwd(state):
        p = state
        _, g = jax.value_and_grad(loss_fn)(p, x)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)

    out["fwdbwd_s"] = t(fwdbwd, params)

    # 3. full train step (fwd+bwd+adam)
    def train_step(state):
        p, o = state
        _, g = jax.value_and_grad(loss_fn)(p, x)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    out["train_s"] = t(train_step, (params, tx.init(params)))

    # 4. adam update alone (params-sized HBM traffic)
    g0 = jax.jit(jax.grad(loss_fn))(params, x)

    def adam_only(state):
        p, o = state
        u, o = tx.update(g0, o, p)
        return optax.apply_updates(p, u), o

    out["adam_s"] = t(adam_only, (params, tx.init(params)), iters=50)

    # 5-7. per-module fwd and fwd+vjp: encoder, decoder, bottleneck
    r, d = cfg.representation_dim, cfg.embedding_dim
    dt = jnp.bfloat16

    cast = lambda tree: jax.tree_util.tree_map(lambda a: a.astype(dt), tree)

    def enc(p, x):
        return encoder_apply(cast(p["encoder"]), x.astype(dt)).astype(jnp.float32)

    z_enc = jax.jit(enc)(params, x)

    # shapes differ between module in/out — chain via an input nudge
    def enc_chain(s):
        z = enc(params, s)
        # fold a scalar of z back into s to keep the chain serial
        return s + jnp.mean(z).astype(s.dtype) * 1e-12

    out["encoder_fwd_s"] = t(enc_chain, x)

    def enc_vjp_chain(s):
        z, vjp = jax.vjp(lambda xx: enc(params, xx), s)
        (gx,) = vjp(z)
        return s + gx * 1e-12

    out["encoder_fwdbwd_s"] = t(enc_vjp_chain, x)

    def enc_vjp_full_chain(s):
        z, vjp = jax.vjp(lambda pp, xx: enc(pp, xx), params, s)
        gp, gx = vjp(z)
        return s + gx * 1e-12 + jnp.mean(gp["encoder"]["conv_1"]["kernel"]).astype(s.dtype) * 1e-12

    out["encoder_fwdbwd_wgrads_s"] = t(enc_vjp_full_chain, x)

    # decoder: input is the quantized latent (B, r, r, d)
    zq = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, r, r, d), np.float32)
    )

    def dec(p, z):
        return decoder_apply(cast(p["decoder"]), z.astype(dt)).astype(jnp.float32)

    def dec_chain(s):
        y = dec(params, s)
        return s + jnp.mean(y).astype(s.dtype) * 1e-12

    out["decoder_fwd_s"] = t(dec_chain, zq)

    def dec_vjp_chain(s):
        y, vjp = jax.vjp(lambda zz: dec(params, zz), s)
        (gz,) = vjp(y)
        return s + gz * 1e-12

    out["decoder_fwdbwd_s"] = t(dec_vjp_chain, zq)

    def dec_vjp_full_chain(s):
        y, vjp = jax.vjp(lambda pp, zz: dec(pp, zz), params, s)
        gp, gz = vjp(y)
        return s + gz * 1e-12 + jnp.mean(gp["decoder"]["conv_1"]["kernel"]).astype(s.dtype) * 1e-12

    out["decoder_fwdbwd_wgrads_s"] = t(dec_vjp_full_chain, zq)

    # bottleneck (3 hopfield lookups + quantizer), pallas production path
    from hopvae_tpu.ops.bottleneck import bottleneck_params
    from hopvae_tpu.ops.hopfield_pallas import hopfield_bottleneck_pallas

    bp = bottleneck_params(params)
    tok = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, r * r, d), np.float32)
    )

    def bn_chain(s):
        e, zqq, rr = hopfield_bottleneck_pallas(bp, s, cfg.num_levels)
        return s + rr * 1e-12

    out["bottleneck_fwd_s"] = t(bn_chain, tok)

    def bn_vjp_chain(s):
        def f(ss):
            e, zqq, rr = hopfield_bottleneck_pallas(bp, ss, cfg.num_levels)
            return jnp.mean((rr - e) ** 2)

        l, g = jax.value_and_grad(f)(s)
        return s + g * 1e-12

    out["bottleneck_fwdbwd_s"] = t(bn_vjp_chain, tok)

    def bn_vjp_full_chain(s):
        def f(pp, ss):
            e, zqq, rr = hopfield_bottleneck_pallas(pp, ss, cfg.num_levels)
            return jnp.mean((rr - e) ** 2)

        (gp, g) = jax.grad(f, (0, 1))(bp, s)
        return s + g * 1e-12 + jnp.mean(gp["hopfield"]["lookup_weights"]) * 1e-12

    out["bottleneck_fwdbwd_wgrads_s"] = t(bn_vjp_full_chain, tok)

    # 8. the decisive A/B: full fwd+bwd vs the SAME conv stack with an
    #    identity bottleneck — the difference is the bottleneck subgraph's
    #    true in-model cost (isolated probes carry loop overheads; this
    #    pair runs interleaved in one process)
    def loss_nobn(p, x):
        z = model._encode_to_tokens(p, x)
        xr = model._tokens_to_image(p, z)
        return jnp.mean((xr - x) ** 2) + jnp.mean(z) * 1e-9

    def fwdbwd_of(loss):
        def step(p):
            _, g = jax.value_and_grad(loss)(p, x)
            return jax.tree_util.tree_map(lambda a, bb: a - 1e-12 * bb, p, g)

        return step

    ab = {"full": [], "nobn": []}
    for name, loss in [("full", loss_fn), ("nobn", loss_nobn)] * 2:
        ab[name].append(t(fwdbwd_of(loss), params, repeats=3))
    out["ab_full_fwdbwd_s"] = sum(ab["full"]) / 2
    out["ab_conv_stack_fwdbwd_s"] = sum(ab["nobn"]) / 2
    out["ab_bottleneck_subgraph_s"] = out["ab_full_fwdbwd_s"] - out["ab_conv_stack_fwdbwd_s"]

    # analytic accounting
    fwd_fl = fl.forward_flops_per_image(cfg)
    trn_fl = fl.train_flops_per_image(cfg)
    out["fwd_mfu"] = fl.mfu(fwd_fl, b / out["fwd_s"])
    out["train_mfu"] = fl.mfu(trn_fl, b / out["train_s"])
    out["bwd_only_s"] = out["fwdbwd_s"] - out["fwd_s"]
    out["opt_overhead_s"] = out["train_s"] - out["fwdbwd_s"]
    out["bwd_mfu_implied"] = fl.mfu(trn_fl - fwd_fl, b / max(out["bwd_only_s"], 1e-12))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
