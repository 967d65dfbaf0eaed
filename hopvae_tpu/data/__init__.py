"""Data pipeline — torchvision-free equivalents of the reference loaders.

Parity target: ``get_data_loaders`` (``/root/reference/utils/__init__.py:85-129``)
which builds MNIST / CIFAR10 / FFHQ train/val/test loaders with dataset-
specific normalization. This environment has no torchvision and no network
(SURVEY.md §4.5), so:

- MNIST: a self-written IDX (ubyte) reader for user-provided files, with a
  procedurally *rendered-digit* fallback (PIL bitmap font) so training and
  tests run hermetically.
- CIFAR10: python-pickle batch reader (the standard ``cifar-10-batches-py``
  layout). The reference's CIFAR10 branch crashes on an unimported numpy
  (``utils/__init__.py:109``) — documented divergence: ours works.
- FFHQ: image-folder reader via PIL with the reference's 70/10/20 random
  split, plus a synthetic-gradient-image fallback.

Batches are NHWC float32, normalized exactly as the reference transforms:
MNIST ``(x-0.1307)/0.3081``; CIFAR10/FFHQ ``x-0.5`` (std 1).

Device feeding is host→device per batch, double-buffered by dispatch-ahead
(JAX's async dispatch overlaps the copy with the previous step's compute).
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from dataclasses import dataclass
from typing import Iterator

import numpy as np

MNIST_MEAN, MNIST_STD = 0.1307, 0.3081


# ----------------------------------------------------------------- readers


def read_idx(path: str) -> np.ndarray:
    """Self-written IDX (ubyte) reader — MNIST's native format."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def _find(path: str, names: tuple) -> str | None:
    for n in names:
        for cand in (os.path.join(path, n), os.path.join(path, "MNIST", "raw", n)):
            for ext in ("", ".gz"):
                if os.path.exists(cand + ext):
                    return cand + ext
    return None


def load_mnist(path: str) -> tuple | None:
    """(train_x, train_y, test_x, test_y) uint8, or None if files absent."""
    tr_x = _find(path, ("train-images-idx3-ubyte", "train-images.idx3-ubyte"))
    tr_y = _find(path, ("train-labels-idx1-ubyte", "train-labels.idx1-ubyte"))
    te_x = _find(path, ("t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"))
    te_y = _find(path, ("t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"))
    if not all((tr_x, tr_y, te_x, te_y)):
        return None
    return read_idx(tr_x), read_idx(tr_y), read_idx(te_x), read_idx(te_y)


def load_cifar10(path: str) -> tuple | None:
    """Read the standard ``cifar-10-batches-py`` pickles; None if absent."""
    base = os.path.join(path, "cifar-10-batches-py")
    if not os.path.isdir(base):
        base = path
    batches = [os.path.join(base, f"data_batch_{i}") for i in range(1, 6)]
    test = os.path.join(base, "test_batch")
    if not (all(os.path.exists(b) for b in batches) and os.path.exists(test)):
        return None

    def _read(p):
        with open(p, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x, np.asarray(d[b"labels"], dtype=np.int64)

    xs, ys = zip(*[_read(b) for b in batches])
    te_x, te_y = _read(test)
    return np.concatenate(xs), np.concatenate(ys), te_x, te_y


def list_image_files(path: str) -> list:
    """Sorted recursive listing of image files under ``path`` (``.npy`` =
    pre-resized uint8 HWC arrays, the decode-free streaming format)."""
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".npy")
    if not path or not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.lower().endswith(exts)
    )


def _read_image_uint8(path: str, image_size: int) -> np.ndarray:
    """One file → (H, W, 3) uint8. ``.npy`` must be pre-resized."""
    if path.endswith(".npy"):
        a = np.load(path)
        if (
            a.dtype != np.uint8
            and np.issubdtype(a.dtype, np.integer)
            and a.size
            and 0 <= a.min()
            and a.max() <= 255
        ):
            # integer arrays already in uint8 range (e.g. int64 from
            # np.save of python ints) cast losslessly; floats still raise —
            # a silent cast would truncate e.g. float [0,1] images to 0/1
            a = a.astype(np.uint8)
        if a.shape != (image_size, image_size, 3) or a.dtype != np.uint8:
            raise ValueError(
                f"{path}: expected pre-resized ({image_size},{image_size},3) "
                f"uint8 (or integer values in [0,255]), got {a.shape} {a.dtype}"
            )
        return a
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img)


def load_image_folder(path: str, image_size: int) -> np.ndarray | None:
    """Flat/recursive folder of images → (N, H, W, 3) uint8 (FFHQ-style)."""
    files = list_image_files(path)
    if not files:
        return None
    out = np.empty((len(files), image_size, image_size, 3), np.uint8)
    for i, fp in enumerate(files):
        out[i] = _read_image_uint8(fp, image_size)
    return out


# ------------------------------------------------------------- synthetic


def render_digits(
    n: int, image_size: int = 28, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Hermetic MNIST-like data: PIL-bitmap-font digits with random shifts.

    Used when no real MNIST files are available (no network here); keeps
    training/eval/tests runnable end-to-end.
    """
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    rng = np.random.default_rng(seed)
    xs = np.zeros((n, image_size, image_size), np.uint8)
    ys = rng.integers(0, 10, n)
    for i, d in enumerate(ys):
        img = Image.new("L", (image_size, image_size), 0)
        dx, dy = rng.integers(4, 13), rng.integers(2, 11)
        ImageDraw.Draw(img).text((int(dx), int(dy)), str(int(d)), fill=255, font=font)
        xs[i] = np.asarray(img)
    return xs, ys.astype(np.int64)


def synthetic_images(n: int, image_size: int, seed: int = 0) -> np.ndarray:
    """Smooth random low-frequency RGB images (FFHQ stand-in)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, 8, 8, 3)).astype(np.float32)
    import jax.image

    up = np.asarray(
        jax.image.resize(base, (n, image_size, image_size, 3), "bilinear")
    )
    up = (up - up.min()) / (np.ptp(up) + 1e-6)
    return (up * 255).astype(np.uint8)


# ------------------------------------------------------------- datasets


@dataclass
class ArrayDataset:
    """In-memory dataset of normalized NHWC float32 images + int labels."""

    images: np.ndarray
    labels: np.ndarray

    def __len__(self):
        return len(self.images)

    def gather(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.images[idx], self.labels[idx]


class LazyImageFolder:
    """Streaming image-folder dataset: holds only the file list; images are
    read, resized, and normalized per batch at ``gather`` time. This is the
    path that survives FFHQ-at-full-resolution — nothing is ever
    materialized beyond one batch (VERDICT r1 "streaming data input").
    Combine with ``iterate_batches(..., prefetch=N)`` to overlap the host
    IO with device compute.

    Throughput notes (the device consumes 33k img/s at FFHQ-64 training —
    a serial PIL decode at ~0.3 ms/image cannot feed it):

    - decode fans out over a thread pool (PIL's inflate/resize release
      the GIL) — sized to the host's cores, a no-op on 1-vCPU hosts;
    - ``.npy`` files (pre-resized uint8 HWC arrays) bypass PNG inflate
      entirely — wins when decode dominates (large images, multi-core
      hosts); at 64×64 both formats are syscall- not decode-bound and
      measure within noise of each other (BASELINE.md "input pipeline").

    When the whole dataset fits the ``Trainer`` HBM budget, prefer an
    in-memory dataset: it is staged to the device once and batches are
    gathered on-device, taking the host pipeline out of the loop
    entirely (``Trainer._device_data``).
    """

    def __init__(self, files: list, image_size: int, data_set: str = "FFHQ",
                 decode_threads: int | None = None):
        self.files = list(files)
        self.image_size = image_size
        self.data_set = data_set
        n = decode_threads if decode_threads is not None else min(8, os.cpu_count() or 1)
        self._pool = None
        if n > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=n, thread_name_prefix="decode")

    def __len__(self):
        return len(self.files)

    def _read_one(self, path: str) -> np.ndarray:
        return _read_image_uint8(path, self.image_size)

    def gather(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        paths = [self.files[int(i)] for i in np.asarray(idx)]
        if self._pool is not None:
            imgs = list(self._pool.map(self._read_one, paths))
        else:
            imgs = [self._read_one(p) for p in paths]
        out = np.stack(imgs) if imgs else np.empty((0, self.image_size, self.image_size, 3), np.uint8)
        return _normalize(out, self.data_set), np.zeros(len(idx), np.int64)


# number of folder images above which get_datasets switches to the
# streaming loader by default (≈1 GB of 64×64 uint8 RGB)
STREAMING_THRESHOLD = 65536


def _normalize(x_uint8: np.ndarray, data_set: str) -> np.ndarray:
    x = x_uint8.astype(np.float32) / 255.0
    if data_set == "MNIST":
        x = (x - MNIST_MEAN) / MNIST_STD
        if x.ndim == 3:
            x = x[..., None]
    else:  # CIFAR10 / FFHQ: Normalize((.5,.5,.5),(1,1,1))
        x = x - 0.5
    return x


def _resize_uint8(x: np.ndarray, size: int) -> np.ndarray:
    """Bilinear-resize a uint8 image batch (reference ``transforms.Resize``
    semantics, ``utils/__init__.py:88``)."""
    if x.shape[1] == size and x.shape[2] == size:
        return x
    from PIL import Image

    chan = x.shape[3] if x.ndim == 4 else 1
    out = np.empty((len(x), size, size) + ((chan,) if x.ndim == 4 else ()), np.uint8)
    for i, img in enumerate(x):
        pil = Image.fromarray(img.squeeze() if x.ndim == 3 else img)
        out[i] = np.asarray(pil.resize((size, size), Image.BILINEAR)).reshape(out.shape[1:])
    return out


def get_datasets(config, path: str | None, *, streaming: bool | None = None):
    """(train, val, test) datasets per the reference's split semantics.

    MNIST: val == test == the 10k test set (reference uses the test set for
    both, ``utils/__init__.py:94-95``). FFHQ: random 70/10/20 split.
    Falls back to synthetic data when ``path`` has no usable files.

    ``streaming`` (FFHQ only): serve batches straight from the image files
    via :class:`LazyImageFolder` instead of materializing one resident
    array. Default (None) auto-enables above ``STREAMING_THRESHOLD`` files.
    """
    ds_name = config.data_set
    if ds_name == "MNIST":
        raw = load_mnist(path) if path else None
        if raw is None:
            tr_x, tr_y = render_digits(4096, config.image_size, config.seed)
            te_x, te_y = render_digits(512, config.image_size, config.seed + 1)
        else:
            tr_x, tr_y, te_x, te_y = raw
            # reference applies transforms.Resize(image_size) to real MNIST
            tr_x = _resize_uint8(tr_x, config.image_size)
            te_x = _resize_uint8(te_x, config.image_size)
        config.data_variance = 1
        train = ArrayDataset(_normalize(tr_x, ds_name), tr_y)
        test = ArrayDataset(_normalize(te_x, ds_name), te_y)
        return train, test, test

    if ds_name == "CIFAR10":
        raw = load_cifar10(path) if path else None
        if raw is None:
            tr_x = synthetic_images(2048, config.image_size, config.seed)
            te_x = synthetic_images(256, config.image_size, config.seed + 1)
            tr_y = np.zeros(len(tr_x), np.int64)
            te_y = np.zeros(len(te_x), np.int64)
        else:
            tr_x, tr_y, te_x, te_y = raw
        config.data_variance = float(np.var(tr_x / 255.0))
        train = ArrayDataset(_normalize(tr_x, ds_name), tr_y)
        test = ArrayDataset(_normalize(te_x, ds_name), te_y)
        return train, test, test

    if ds_name == "FFHQ":
        config.data_variance = 1
        files = list_image_files(path) if path else []
        if files:
            if streaming is None:
                streaming = len(files) > STREAMING_THRESHOLD
            rng = np.random.default_rng(config.seed)
            perm = rng.permutation(len(files))
            n_tr, n_va = int(len(files) * 0.7), int(len(files) * 0.1)
            splits = (perm[:n_tr], perm[n_tr : n_tr + n_va], perm[n_tr + n_va :])
            if streaming:
                return tuple(
                    LazyImageFolder([files[i] for i in s], config.image_size, ds_name)
                    for s in splits
                )
            imgs = load_image_folder(path, config.image_size)
            x = _normalize(imgs, ds_name)
            zeros = np.zeros(len(imgs), np.int64)
            return tuple(ArrayDataset(x[s], zeros[s]) for s in splits)
        imgs = synthetic_images(2048, config.image_size, config.seed)
        rng = np.random.default_rng(config.seed)
        perm = rng.permutation(len(imgs))
        n_tr, n_va = int(len(imgs) * 0.7), int(len(imgs) * 0.1)
        splits = (perm[:n_tr], perm[n_tr : n_tr + n_va], perm[n_tr + n_va :])
        x = _normalize(imgs, ds_name)
        zeros = np.zeros(len(imgs), np.int64)
        return tuple(ArrayDataset(x[s], zeros[s]) for s in splits)

    raise ValueError(f"unknown data_set {ds_name!r}")


def _prefetched(gen, depth: int):
    """Run ``gen`` on a daemon thread, keeping ``depth`` batches ready —
    host IO (file reads, decode, normalize) overlaps device compute.

    The worker's puts poll a stop event so an abandoned consumer (an
    exception mid-epoch, a break, GC of the generator) releases the thread
    and its in-flight decoded batches instead of leaking them."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # propagate into the consumer
            _put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def iterate_batches(
    ds,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    drop_remainder: bool = False,
    prefetch: int = 0,
    local_slice: tuple[int, int] | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Numpy batch iterator (the host side of the input pipeline).

    ``ds`` is anything with ``__len__`` and ``gather(indices)`` —
    in-memory (:class:`ArrayDataset`) or streaming
    (:class:`LazyImageFolder`). ``prefetch > 0`` decodes that many batches
    ahead on a background thread.

    ``local_slice=(start, stop)`` (multi-host input sharding): yield only
    that sub-range of every batch — the shuffle permutation is seeded, so
    all hosts agree on the global order while each reads/decodes ONLY the
    files of its own ``parallel.mesh.process_batch_bounds`` slice.
    Requires ``drop_remainder`` (a ragged final batch would change the
    per-process split).
    """
    if local_slice is not None and not drop_remainder:
        raise ValueError(
            "local_slice needs drop_remainder=True: the final ragged batch "
            "has no well-defined per-process split"
        )
    idx = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    end = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)

    def gen():
        for i in range(0, end, batch_size):
            b = idx[i : i + batch_size]
            if local_slice is not None:
                b = b[local_slice[0] : local_slice[1]]
            yield ds.gather(b)

    return _prefetched(gen(), prefetch) if prefetch > 0 else gen()
