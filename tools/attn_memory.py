"""Measure the Transformer-prior training-step memory bound: dense vs
blocked attention, from XLA's own compiled memory analysis (deterministic,
no allocation needed — the dense r=33 case would OOM if actually run).

Usage: python tools/attn_memory.py [--batch 64]

Prints one JSON line per (geometry, backend) with XLA's temp-allocation
and argument sizes for jit(value_and_grad(nll)) — the exact quantity that
decides whether a training step fits in HBM.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.models.priors.transformer import TransformerPrior


def measure(r: int, attn: str, batch: int, heads=None) -> dict:
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = r
    cfg.num_levels = 512
    cfg.prior_attn = attn
    if heads is not None:
        cfg.prior_heads = heads
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))
    g = jnp.zeros((batch, r, r, cfg.index_dim), jnp.float32)

    def nll(p, g):
        logp = jax.nn.log_softmax(prior.forward(p, g), axis=-1)
        tgt = g.astype(jnp.int32)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], axis=-1))

    row = {"r": r, "seq": prior.seq, "attn": attn, "batch": batch, "heads": prior.heads}
    if attn == "flash" and jax.default_backend() != "tpu":
        # flash_causal_attention falls back to blocked off-TPU — this row
        # would silently duplicate the blocked numbers (review finding)
        row["note"] = "off-TPU: flash falls back to blocked; numbers ARE the blocked backend's"
    lowered = jax.jit(jax.value_and_grad(nll)).lower(params, g)
    try:
        ma = lowered.compile().memory_analysis()
    except Exception as e:  # XLA AOT refuses programs that exceed HBM
        import re

        row["compile_oom"] = True
        # surface XLA's own requirement, e.g. "Used 43.11G of 15.75G hbm"
        m = re.search(r"Used [\d.]+\w of [\d.]+\w hbm", str(e))
        if m:
            row["xla_error"] = m.group(0)
        return row
    row.update(
        temp_gib=ma.temp_size_in_bytes / 2**30,
        output_gib=ma.output_size_in_bytes / 2**30,
        argument_gib=ma.argument_size_in_bytes / 2**30,
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--geometries", type=int, nargs="+", default=[17, 33])
    ap.add_argument("--heads", type=int, default=None)
    args = ap.parse_args()
    for r in args.geometries:
        for attn in ("dense", "blocked", "flash"):
            row = measure(r, attn, args.batch, args.heads)
            print(json.dumps(row))


if __name__ == "__main__":
    main()
