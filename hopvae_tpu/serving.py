"""Serving: ahead-of-time-compiled inference over fixed batch shapes.

The reference has no serving path (SURVEY.md §1: "no serving path"); this
is the production-deployment surface the TPU build adds. Design:

- ``InferenceEngine`` AOT-lowers/compiles reconstruct / encode / sample
  for a fixed ``max_batch`` at construction (no first-request compile
  stall), pads ragged batches up to it, and slices results back.
- The compute path uses the production configuration by default: fused
  Pallas bottleneck + bf16 conv stacks (golden recon-MSE delta 0.2%,
  BASELINE.md). Pass ``impl="xla"``/``compute_dtype=None`` for the f32
  parity path.
- ``python -m hopvae_tpu.serving`` is a batch processor: reads image
  files (PNG/JPEG via PIL, or .npy arrays), writes reconstructions /
  samples — the offline-serving shape of the same engine.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from hopvae_tpu.config import apply_overrides, load_config
from hopvae_tpu.data import MNIST_MEAN, MNIST_STD
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.utils import checkpoint as ckpt_lib


class InferenceEngine:
    def __init__(
        self,
        config,
        params,
        *,
        max_batch: int = 64,
        impl: str = "pallas",
        compute_dtype=jnp.bfloat16,
        n_sample: int = 16,
        ops: tuple = ("reconstruct", "encode", "sample", "interpolate"),
    ):
        """``ops`` selects which entry points to AOT-compile — a
        reconstruct-only deployment should not pay the AR sampler's
        (much longer) compile."""
        self.config = config
        self.max_batch = max_batch
        self.n_sample = n_sample
        self.model = HopVAE(config, impl=impl, compute_dtype=compute_dtype)
        self.params = jax.device_put(params)
        c, s = config.num_channels, config.image_size

        x_shape = jax.ShapeDtypeStruct((max_batch, s, s, c), jnp.float32)
        p_shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params
        )
        key_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)

        # AOT: lower + compile now, not on first request
        self._recon = self._encode = self._sample = self._interp = None
        if "reconstruct" in ops:
            self._recon = (
                jax.jit(lambda p, x: self.model.forward(p, x)[0])
                .lower(p_shapes, x_shape)
                .compile()
            )
        if "encode" in ops:
            self._encode = (
                jax.jit(self.model._encode_to_tokens).lower(p_shapes, x_shape).compile()
            )
        if "sample" in ops:
            self._sample = (
                jax.jit(lambda p, k: self.model.sample(p, k, n_sample))
                .lower(p_shapes, key_shape)
                .compile()
            )
        if "interpolate" in ops:
            self._interp = (
                jax.jit(self.model.interpolate)
                .lower(p_shapes, x_shape, x_shape)
                .compile()
            )

    def _pad(self, x: np.ndarray):
        n = x.shape[0]
        if n > self.max_batch:
            raise ValueError(f"batch {n} exceeds max_batch {self.max_batch}")
        if n < self.max_batch:
            x = np.concatenate(
                [x, np.zeros((self.max_batch - n, *x.shape[1:]), x.dtype)]
            )
        return x, n

    @staticmethod
    def _require(fn, name):
        if fn is None:
            raise RuntimeError(f"{name!r} was not in this engine's compiled ops")
        return fn

    def reconstruct(self, x: np.ndarray) -> np.ndarray:
        """Normalized NHWC batch → reconstructions (unpadded)."""
        xp, n = self._pad(np.asarray(x, np.float32))
        return np.asarray(self._require(self._recon, "reconstruct")(self.params, xp))[:n]

    def encode(self, x: np.ndarray) -> np.ndarray:
        """Normalized NHWC batch → pre-VQ latent tokens (B, r², d)."""
        xp, n = self._pad(np.asarray(x, np.float32))
        return np.asarray(self._require(self._encode, "encode")(self.params, xp))[:n]

    def sample(self, seed: int = 0) -> np.ndarray:
        """``n_sample`` unconditional generations."""
        key = jax.random.PRNGKey(seed)
        return np.asarray(self._require(self._sample, "sample")(self.params, jnp.asarray(key)))

    def interpolate(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Pairwise latent-space interpolation of two equal-shape batches
        (the reference's eval surface, ``main.py:69,76``)."""
        xp, n = self._pad(np.asarray(x, np.float32))
        yp, m = self._pad(np.asarray(y, np.float32))
        if n != m:
            raise ValueError(f"interpolate needs equal batch sizes, got {n} and {m}")
        return np.asarray(self._require(self._interp, "interpolate")(self.params, xp, yp))[:n]


# ----------------------------------------------------------------- CLI


def _load_images(paths, config) -> np.ndarray:
    from PIL import Image

    s, c = config.image_size, config.num_channels
    out = []
    for p in paths:
        if p.endswith(".npy"):
            # .npy inputs must already be model-normalized float HWC of the
            # config geometry ((s, s) accepted for 1-channel); raw uint8
            # arrays are normalized like image files
            a = np.load(p)
            if a.dtype == np.uint8:
                a = a.astype(np.float32) / 255.0
                a = (a - MNIST_MEAN) / MNIST_STD if config.data_set == "MNIST" else a - 0.5
            a = np.asarray(a, np.float32)
            if a.shape == (s, s) and c == 1:
                a = a[..., None]
            if a.shape != (s, s, c):
                raise ValueError(
                    f"{p}: expected shape ({s}, {s}, {c}) (or ({s}, {s}) for "
                    f"1-channel), got {a.shape}"
                )
            out.append(a)
            continue
        img = Image.open(p)
        img = img.convert("L" if c == 1 else "RGB").resize((s, s), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        if config.data_set == "MNIST":
            a = (a - MNIST_MEAN) / MNIST_STD
        else:
            a = a - 0.5
        out.append(a[..., None] if c == 1 else a)
    return np.stack(out)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Batch inference over image files")
    parser.add_argument("--config", default="mnist_28")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--mode", choices=("reconstruct", "sample", "interpolate"),
                        default="reconstruct")
    parser.add_argument("--out", default="served")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-sample", type=int, default=16)
    parser.add_argument("--max-batch", type=int, default=256,
                        help="engine batch size cap; larger input counts are "
                             "chunked through it (reconstruct + interpolate)")
    parser.add_argument("--impl", default="pallas", choices=("xla", "pallas"))
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=("float32", "bfloat16"))
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                        help="override a config key (repeatable) — needed e.g. to "
                             "serve a checkpoint saved with --set prior=Transformer")
    parser.add_argument("inputs", nargs="*", help="image/.npy files (reconstruct mode)")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    try:
        apply_overrides(config, args.set, config_name=args.config)
    except ValueError as e:
        parser.error(str(e))
    model = HopVAE(config)
    params = model.init(jax.random.PRNGKey(config.seed))
    if not os.path.exists(args.checkpoint):
        # serving must not fall back to fresh params (the trainer's lenient
        # load semantics would silently serve an untrained model)
        parser.error(f"checkpoint not found: {args.checkpoint}")
    # dispatches native .msgpack vs torch .ckpt internally
    params = ckpt_lib.load_reference_checkpoint(model, params, args.checkpoint)

    # validate input counts BEFORE the engine construction pays the AOT
    # compile (minutes on a cold cache for the sampler)
    if args.mode == "interpolate":
        if len(args.inputs) < 2 or len(args.inputs) % 2:
            parser.error("interpolate mode needs an even number (≥2) of input files")
        batch = max(len(args.inputs) // 2, 1)
    elif args.mode == "reconstruct":
        if not args.inputs:
            parser.error("reconstruct mode needs input files")
        batch = max(len(args.inputs), 1)
    else:
        batch = 1
    engine = InferenceEngine(
        config, params, max_batch=min(max(batch, 1), args.max_batch), n_sample=args.n_sample,
        impl=args.impl,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else None,
        ops=(args.mode,),  # compile only what this invocation runs
    )

    from hopvae_tpu.utils.metrics import denormalize, save_image_grid

    os.makedirs(args.out, exist_ok=True)
    if args.mode == "reconstruct":
        x = _load_images(args.inputs, config)
        # chunk through the engine's fixed batch size (arbitrary input counts)
        y = np.concatenate(
            [
                engine.reconstruct(x[i : i + engine.max_batch])
                for i in range(0, len(x), engine.max_batch)
            ]
        )
        save_image_grid(
            os.path.join(args.out, "reconstructions.png"),
            denormalize(y, config.data_set),
        )
        mse = float(np.mean((y - x) ** 2))
        print(f"wrote {args.out}/reconstructions.png ({len(y)} images, recon MSE {mse:.6f})")
    elif args.mode == "interpolate":
        # first half ↔ second half, pairwise (the reference interpolates
        # two whole eval batches, main.py:69,76)
        imgs = _load_images(args.inputs, config)
        half = len(imgs) // 2
        # chunk pairs through the engine's fixed batch size, exactly like
        # reconstruct above (>max_batch pairs used to raise in _pad)
        first, second = imgs[:half], imgs[half:]
        y = np.concatenate(
            [
                engine.interpolate(
                    first[i : i + engine.max_batch], second[i : i + engine.max_batch]
                )
                for i in range(0, half, engine.max_batch)
            ]
        )
        save_image_grid(
            os.path.join(args.out, "interpolations.png"),
            denormalize(y, config.data_set),
        )
        print(f"wrote {args.out}/interpolations.png ({len(y)} interpolations)")
    else:
        y = engine.sample(args.seed)
        save_image_grid(
            os.path.join(args.out, "samples.png"), denormalize(y, config.data_set)
        )
        print(f"wrote {args.out}/samples.png ({len(y)} samples)")


if __name__ == "__main__":
    main()
