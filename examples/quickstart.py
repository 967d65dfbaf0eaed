"""Quickstart: the full library surface in one script.

Train a small Hop-VAE on hermetic synthetic digits, reconstruct a test
batch, draw prior samples, and save image grids — the library-API
counterpart of the `hopvae-train` CLI (reference workflow:
`/root/reference/main.py`).

Run: ``python examples/quickstart.py [--epochs N] [--out DIR]``
(~1 min on a TPU chip; also runs on CPU.)
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable straight from a checkout (`python examples/quickstart.py`)
# without `pip install -e .` — script execution puts examples/ on
# sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from hopvae_tpu import HopVAE, Trainer, load_config
from hopvae_tpu.data import get_datasets
from hopvae_tpu.utils.metrics import denormalize, save_image_grid


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="outputs/quickstart")
    ap.add_argument("--n-train", type=int, default=512)
    args = ap.parse_args(argv)

    cfg = load_config("pixelcnn_mnist_28")  # MNIST geometry + PixelCNN prior
    cfg.prior_start = max(args.epochs - 2, 0)  # engage the prior phase at the end

    # defaults = the portable f32 XLA path (runs anywhere, incl. this
    # script's CPU smoke test); on a TPU, pass impl="pallas",
    # compute_dtype=jnp.bfloat16 for the production fast path
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(cfg.seed))

    # rendered-digit fallback data (pass --data to hopvae-train for real MNIST)
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[: args.n_train], train_ds.labels[: args.n_train]

    trainer = Trainer(model, cfg)
    params, _ = trainer.fit(params, train_ds, test_ds, epochs=args.epochs, out_dir=args.out)

    # reconstruct a test batch and draw unconditional samples
    x = jax.numpy.asarray(test_ds.gather(np.arange(8))[0])
    x_recon, aux = jax.jit(model.forward)(params, x)
    samples = model.sample(params, jax.random.PRNGKey(0), num_samples=16)

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(os.path.join(args.out, "quickstart_inputs.png"), denormalize(np.asarray(x), cfg.data_set))
    save_image_grid(os.path.join(args.out, "quickstart_recons.png"), denormalize(np.asarray(x_recon), cfg.data_set))
    save_image_grid(os.path.join(args.out, "quickstart_samples.png"), denormalize(np.asarray(samples), cfg.data_set))
    print(f"recon MSE: {float(((x_recon - x) ** 2).mean()):.5f}  aux: {float(aux):.6f}")
    print(f"grids written to {args.out}/")


if __name__ == "__main__":
    main()
