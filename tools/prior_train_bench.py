"""Device-true prior-phase training throughput for the AR prior families.

The training artifacts (`artifacts/train_tf_*`) show the bits curves;
this tool measures the images/sec of the prior-phase train step itself —
full model forward (encode → bottleneck → quantized grids) + prior
NLL + prior-only Adam — at the geometries that matter, with the same
chained-`fori_loop` harness as `bench.py`.

Usage: python tools/prior_train_bench.py [--configs ffhq_64_scaled ffhq_128]
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
    ap.add_argument("--configs", nargs="+", default=["ffhq_64_scaled", "ffhq_128"])
    ap.add_argument("--batch", type=int, nargs="+", default=None)
    ap.add_argument("--prior", default="Transformer")
    ap.add_argument("--heads", type=int, default=None, help="override prior_heads")
    ap.add_argument("--attn", default=None, help="override prior_attn")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    batches = args.batch or [64] * len(args.configs)
    if len(batches) == 1:
        batches = batches * len(args.configs)  # one --batch broadcasts
    if len(batches) != len(args.configs):
        ap.error(f"--batch needs 1 or {len(args.configs)} values, got {len(batches)}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.train import Trainer, make_optimizer
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    out = {}
    for name, batch in zip(args.configs, batches):
        cfg = load_config(name)
        cfg.prior = args.prior
        cfg.batch_size = batch
        if args.heads is not None:
            cfg.prior_heads = args.heads
        if args.attn is not None:
            cfg.prior_attn = args.attn
        model = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0))
        tr = Trainer(model, cfg)
        tx = make_optimizer(cfg, 1, prior_only=True, params=params)
        tr._tx = {True: tx}  # train_step reads the fit()-built optimizer map
        opt = tx.init(params)
        step = tr.train_step(True)  # fit_prior=True: the prior-phase step
        x = jnp.asarray(
            np.random.default_rng(0).random(
                (batch, cfg.image_size, cfg.image_size, cfg.num_channels)
            )
            - 0.5,
            jnp.float32,
        )

        def one(state):
            p, o = state
            p, o, _ = step(p, o, x)
            return (p, o)

        dt = device_seconds_per_iter(one, (params, opt), iters=args.iters)
        tag = name + (f"_h{args.heads}" if args.heads else "") + (
            f"_{args.attn}" if args.attn else ""
        )
        out[f"{tag}_prior_train_images_per_sec"] = batch / dt
        print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
