"""Metrics/observability — wandb-free equivalent of the reference logging.

The reference logs scalars and image grids to wandb (``main.py:18,41-43,
78-86``); there is no network here, so metrics go to JSONL (same metric
names) and image grids to PNG. A wandb sink can be layered on the same
interface when available.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricLogger:
    """JSONL logger with an optional wandb sink (the reference's only
    observability, ``main.py:18,41-43`` — used here when wandb is importable
    AND ``WANDB_PROJECT`` is set; this machine has no network)."""

    def __init__(self, out_dir: str, wandb_config: dict | None = None):
        import threading

        import jax

        self.out_dir = out_dir
        # multi-host: all processes share out_dir storage — only process 0
        # writes (JSONL and wandb), mirroring Trainer.save; log() is a
        # no-op elsewhere so per-epoch records are not duplicated N times
        self._primary = jax.process_index() == 0
        if self._primary:
            os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, "metrics.jsonl")
        self._step = 0
        # the Trainer logs epoch records from its async metric thread while
        # eval records come from the main thread — serialize the appends
        # (and the wandb sink, whose auto-step is not thread-safe)
        self._lock = threading.Lock()
        self._wandb = None
        if self._primary and os.environ.get("WANDB_PROJECT"):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=os.environ["WANDB_PROJECT"], config=wandb_config or {}
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: int | None = None) -> None:
        if not self._primary:
            return
        rec = {"time": time.time()}
        rec.update(
            {k: (float(v) if np.isscalar(v) or getattr(v, "ndim", 1) == 0 else v)
             for k, v in metrics.items()}
        )
        with self._lock:
            if step is None:
                step = self._step
                self._step += 1
            # a caller-supplied "step" inside the metrics dict wins over the
            # auto-counter (it did historically; keep that contract)
            rec.setdefault("step", step)
            with open(self._path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if self._wandb is not None:
                self._wandb.log({k: v for k, v in rec.items() if k != "time"})


def denormalize(x: np.ndarray, data_set: str) -> np.ndarray:
    """Invert the dataset normalization back to [0, 1] for visualization."""
    from hopvae_tpu.data import MNIST_MEAN, MNIST_STD

    x = np.asarray(x)
    if data_set == "MNIST":
        x = x * MNIST_STD + MNIST_MEAN
    else:
        x = x + 0.5
    return np.clip(x, 0.0, 1.0)


def save_image_grid(path: str, images: np.ndarray, *, ncol: int = 8) -> None:
    """Tile (N, H, W, C) images in [0,1] into a PNG grid."""
    from PIL import Image

    n, h, w, c = images.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.zeros((nrow * h, ncol * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    arr = (grid * 255).astype(np.uint8)
    if c == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)
