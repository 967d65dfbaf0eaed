"""Batch-scaling sweep on the local TPU: FFHQ-64 recon and train-step
throughput/MFU of the production path (bf16 + streaming Pallas bottleneck)
across batch sizes. Documents where the chip saturates — the numbers
quoted in BASELINE.md's scaling paragraph come from this script.

Run: ``python tools/scaling_sweep.py`` (a few minutes warm).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from hopvae_tpu.config import load_config
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.utils import flops as fl
from hopvae_tpu.utils.benchmark import device_seconds_per_iter


def main() -> None:
    cfg = load_config("ffhq_64")
    model = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    fwd_fl = fl.forward_flops_per_image(cfg)
    trn_fl = fl.train_flops_per_image(cfg)

    print(f"{'batch':>6} {'recon img/s':>12} {'MFU':>5}   {'train img/s':>12} {'MFU':>5}")
    for batch in (32, 64, 128, 256, 512, 1024):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, 64, 64, 3), np.float32)
        )
        dt = device_seconds_per_iter(
            lambda s: model.forward(params, s)[0], x, iters=20, repeats=3
        )
        recon_ips = batch / dt

        def train_step(state):
            p, o = state

            def loss_fn(p):
                xr, aux = model.forward(p, x)
                return jnp.mean((xr - x) ** 2) + aux

            g = jax.grad(loss_fn)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o

        dt = device_seconds_per_iter(train_step, (params, tx.init(params)), iters=10)
        train_ips = batch / dt
        print(
            f"{batch:>6} {recon_ips:>12,.0f} {fl.mfu(fwd_fl, recon_ips):>5.2f}   "
            f"{train_ips:>12,.0f} {fl.mfu(trn_fl, train_ips):>5.2f}"
        )


if __name__ == "__main__":
    main()
