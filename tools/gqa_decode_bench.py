"""A/B the Transformer-prior decode with grouped-query attention.

The decode step is HBM-bound on reading the per-layer K/V caches
(BASELINE.md round-2/3 measurements), and cache bytes scale linearly in
``prior_kv_heads`` — so MQA (kv_heads=1 vs the default heads=4) should
approach a 4× step-time cut wherever cache reads dominate.  This tool
measures it instead of assuming it.

Usage: python tools/gqa_decode_bench.py [--r 8 17] [--batch 1024 2048]
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
    ap.add_argument("--r", type=int, nargs="+", default=[8, 17])
    ap.add_argument("--batch", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--d", type=int, nargs="+", default=None, help="prior_d_model per (r, batch) point (default 128)")
    ap.add_argument("--kv", type=int, nargs="+", default=[4, 1])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    assert len(args.r) == len(args.batch)
    d_models = args.d or [128] * len(args.r)
    assert len(d_models) == len(args.r)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    out = {}
    for r, b, d in zip(args.r, args.batch, d_models):
        tag = f"r{r}_b{b}_d{d}"
        for kv in args.kv:
            cfg = load_config("pixelcnn_mnist_28")
            cfg.representation_dim = r
            cfg.num_levels = 512
            cfg.prior_d_model = d
            cfg.prior_kv_heads = kv
            prior = TransformerPrior(cfg)
            params = prior.init(jax.random.PRNGKey(0))

            def step(key):
                s = prior.sample(params, key, b)
                return jax.random.fold_in(key, s.astype("int32").sum())

            dt = device_seconds_per_iter(step, jax.random.PRNGKey(0), iters=args.iters)
            out[f"{tag}_kv{kv}_samples_per_sec"] = b / dt
            print(json.dumps(out, indent=1), flush=True)
        if 1 in args.kv and 4 in args.kv:
            out[f"{tag}_mqa_speedup"] = (
                out[f"{tag}_kv1_samples_per_sec"] / out[f"{tag}_kv4_samples_per_sec"]
            )
            print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
