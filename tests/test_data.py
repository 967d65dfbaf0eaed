"""Data-layer readers: IDX (MNIST native), CIFAR10 pickles, image folder,
and the reference-exact normalizations — all against synthesized files."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from hopvae_tpu.config import load_config
from hopvae_tpu.data import (
    MNIST_MEAN,
    MNIST_STD,
    get_datasets,
    iterate_batches,
    load_cifar10,
    load_image_folder,
    load_mnist,
    read_idx,
)


def _write_idx_images(path, arr: np.ndarray, gz=False):
    # IDX format: magic 0x0000080{ndim} (ubyte dtype), big-endian dims, raw data
    magic = struct.pack(">I", 0x00000800 | arr.ndim)
    data = magic + struct.pack(">" + "I" * arr.ndim, *arr.shape) + arr.tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(data)


def test_read_idx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    labels = rng.integers(0, 10, (5,)).astype(np.uint8)
    _write_idx_images(tmp_path / "imgs.idx", imgs)
    _write_idx_images(tmp_path / "labels.idx.gz", labels, gz=True)
    np.testing.assert_array_equal(read_idx(str(tmp_path / "imgs.idx")), imgs)
    np.testing.assert_array_equal(read_idx(str(tmp_path / "labels.idx.gz")), labels)


def test_load_mnist_from_idx_files(tmp_path):
    rng = np.random.default_rng(1)
    for name, shape in [
        ("train-images-idx3-ubyte", (6, 28, 28)),
        ("t10k-images-idx3-ubyte", (4, 28, 28)),
    ]:
        _write_idx_images(tmp_path / name, rng.integers(0, 256, shape).astype(np.uint8))
    for name, n in [("train-labels-idx1-ubyte", 6), ("t10k-labels-idx1-ubyte", 4)]:
        _write_idx_images(tmp_path / name, rng.integers(0, 10, (n,)).astype(np.uint8))
    out = load_mnist(str(tmp_path))
    assert out is not None
    tr_x, tr_y, te_x, te_y = out
    assert tr_x.shape == (6, 28, 28) and te_y.shape == (4,)

    cfg = load_config("mnist_28")
    train, val, test = get_datasets(cfg, str(tmp_path))
    assert len(train) == 6 and len(test) == 4
    # reference normalization: (x/255 - 0.1307) / 0.3081 (utils/__init__.py:88-91)
    expected = (tr_x.astype(np.float32) / 255.0 - MNIST_MEAN) / MNIST_STD
    np.testing.assert_allclose(train.images[..., 0], expected, rtol=1e-6)


def test_load_cifar10_from_pickles(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    rng = np.random.default_rng(2)

    def _batch(path, n):
        with open(path, "wb") as f:
            pickle.dump(
                {b"data": rng.integers(0, 256, (n, 3072)).astype(np.uint8),
                 b"labels": list(rng.integers(0, 10, n))},
                f,
            )

    for i in range(1, 6):
        _batch(base / f"data_batch_{i}", 4)
    _batch(base / "test_batch", 3)

    out = load_cifar10(str(tmp_path))
    assert out is not None
    tr_x, tr_y, te_x, te_y = out
    assert tr_x.shape == (20, 32, 32, 3) and te_x.shape == (3, 32, 32, 3)

    cfg = load_config("cifar10_32")
    train, val, test = get_datasets(cfg, str(tmp_path))
    assert len(train) == 20
    # data_variance is computed (the reference crashes here — divergence)
    assert 0 < cfg.data_variance < 1


def test_load_image_folder(tmp_path):
    from PIL import Image

    for i in range(4):
        Image.new("RGB", (40, 40), (i * 40, 10, 200)).save(tmp_path / f"img{i}.png")
    imgs = load_image_folder(str(tmp_path), 32)
    assert imgs.shape == (4, 32, 32, 3)

    cfg = load_config("ffhq_32")
    train, val, test = get_datasets(cfg, str(tmp_path))
    # reference split 70/10/20 (utils/__init__.py:119)
    assert len(train) == 2 and len(test) >= 1


def test_iterate_batches_drop_remainder():
    from hopvae_tpu.data import ArrayDataset

    ds = ArrayDataset(np.zeros((10, 4, 4, 1), np.float32), np.zeros(10, np.int64))
    full = list(iterate_batches(ds, 4, shuffle=False))
    assert [len(b[0]) for b in full] == [4, 4, 2]
    dropped = list(iterate_batches(ds, 4, shuffle=False, drop_remainder=True))
    assert [len(b[0]) for b in dropped] == [4, 4]


def test_streaming_folder_matches_in_memory(tmp_path):
    """LazyImageFolder must serve byte-identical batches to the resident
    ArrayDataset path (same split, same normalization, same order)."""
    from PIL import Image

    for i in range(10):
        Image.new("RGB", (40, 40), (i * 25, 10, 200)).save(tmp_path / f"img{i}.png")

    cfg = load_config("ffhq_32")
    mem = get_datasets(cfg, str(tmp_path), streaming=False)
    lazy = get_datasets(cfg, str(tmp_path), streaming=True)
    from hopvae_tpu.data import ArrayDataset, LazyImageFolder

    for m, l in zip(mem, lazy):
        assert isinstance(m, ArrayDataset) and isinstance(l, LazyImageFolder)
        assert len(m) == len(l)
        mb = list(iterate_batches(m, 3, shuffle=True, seed=7))
        lb = list(iterate_batches(l, 3, shuffle=True, seed=7))
        for (mx, _), (lx, _) in zip(mb, lb):
            np.testing.assert_allclose(mx, lx, atol=1e-6)


def test_prefetch_same_batches_and_propagates_errors(tmp_path):
    from hopvae_tpu.data import ArrayDataset

    rng = np.random.default_rng(3)
    ds = ArrayDataset(rng.standard_normal((13, 4, 4, 1)).astype(np.float32),
                      np.arange(13, dtype=np.int64))
    plain = list(iterate_batches(ds, 4, shuffle=True, seed=5))
    pre = list(iterate_batches(ds, 4, shuffle=True, seed=5, prefetch=2))
    assert len(plain) == len(pre)
    for (a, al), (b, bl) in zip(plain, pre):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(al, bl)

    class Broken:
        def __len__(self):
            return 8

        def gather(self, idx):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(iterate_batches(Broken(), 4, shuffle=False, prefetch=2))


def test_mnist_resized_to_config_image_size(tmp_path):
    """Real MNIST files get the reference's transforms.Resize(image_size)
    treatment when the config overrides image_size."""
    rng = np.random.default_rng(4)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte",
                      rng.integers(0, 256, (6, 28, 28)).astype(np.uint8))
    _write_idx_images(tmp_path / "t10k-images-idx3-ubyte",
                      rng.integers(0, 256, (4, 28, 28)).astype(np.uint8))
    _write_idx_images(tmp_path / "train-labels-idx1-ubyte",
                      rng.integers(0, 10, (6,)).astype(np.uint8))
    _write_idx_images(tmp_path / "t10k-labels-idx1-ubyte",
                      rng.integers(0, 10, (4,)).astype(np.uint8))
    cfg = load_config("mnist_28")
    cfg.image_size = 32
    train, _, test = get_datasets(cfg, str(tmp_path))
    assert train.images.shape == (6, 32, 32, 1)
    assert test.images.shape == (4, 32, 32, 1)


def test_serving_npy_inputs_validated(tmp_path):
    """.npy inputs: uint8 gets normalized like image files; wrong shapes
    are rejected instead of silently producing garbage recons."""
    from hopvae_tpu.serving import _load_images

    cfg = load_config("mnist_28")
    raw = np.random.default_rng(5).integers(0, 256, (28, 28)).astype(np.uint8)
    p = str(tmp_path / "a.npy")
    np.save(p, raw)
    out = _load_images([p], cfg)
    expected = (raw.astype(np.float32) / 255.0 - MNIST_MEAN) / MNIST_STD
    np.testing.assert_allclose(out[0, ..., 0], expected, rtol=1e-6)

    bad = str(tmp_path / "b.npy")
    np.save(bad, np.zeros((16, 16), np.float32))
    with pytest.raises(ValueError, match="expected shape"):
        _load_images([bad], cfg)


def test_npy_streaming_and_threaded_decode(tmp_path):
    """.npy files (pre-resized uint8 HWC — the decode-free streaming
    format) must serve identically to PNGs of the same pixels, including
    through the thread-pool decode path."""
    from PIL import Image

    from hopvae_tpu.data import LazyImageFolder, list_image_files

    rng = np.random.default_rng(0)
    imgs = (rng.random((6, 16, 16, 3)) * 255).astype(np.uint8)
    for i, a in enumerate(imgs):
        Image.fromarray(a).save(tmp_path / f"png_{i}.png")
        np.save(tmp_path / f"npy_{i}.npy", a)

    files = list_image_files(str(tmp_path))
    assert len(files) == 12  # both formats listed

    png = LazyImageFolder(sorted(f for f in files if f.endswith(".png")), 16)
    npy = LazyImageFolder(sorted(f for f in files if f.endswith(".npy")), 16)
    threaded = LazyImageFolder(
        sorted(f for f in files if f.endswith(".npy")), 16, decode_threads=4
    )
    idx = np.array([3, 0, 5])
    x_png, _ = png.gather(idx)
    x_npy, _ = npy.gather(idx)
    x_thr, _ = threaded.gather(idx)
    np.testing.assert_array_equal(x_png, x_npy)
    np.testing.assert_array_equal(x_npy, x_thr)

    # wrong-shape .npy fails loudly, not silently
    np.save(tmp_path / "bad.npy", np.zeros((4, 4, 3), np.uint8))
    import pytest

    with pytest.raises(ValueError, match="pre-resized"):
        LazyImageFolder([str(tmp_path / "bad.npy")], 16).gather(np.array([0]))


def test_npy_reader_rejects_non_uint8(tmp_path):
    """A float .npy of the right shape must raise, not silently truncate
    every pixel to 0/1 (review finding)."""
    import pytest

    from hopvae_tpu.data import _read_image_uint8

    p = tmp_path / "img.npy"
    np.save(p, np.random.default_rng(0).random((8, 8, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="uint8"):
        _read_image_uint8(str(p), 8)
    np.save(p, (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8))
    assert _read_image_uint8(str(p), 8).dtype == np.uint8
    # integer dtypes whose values fit [0,255] cast losslessly (round-4
    # advisor finding: int64 from np.save of python ints used to raise)
    np.save(p, np.full((8, 8, 3), 200, np.int64))
    a = _read_image_uint8(str(p), 8)
    assert a.dtype == np.uint8 and int(a[0, 0, 0]) == 200
    np.save(p, np.full((8, 8, 3), 256, np.int64))  # out of range still raises
    with pytest.raises(ValueError, match="uint8"):
        _read_image_uint8(str(p), 8)


def test_local_slice_requires_drop_remainder():
    """local_slice without drop_remainder must raise ValueError (not a
    bare assert, which vanishes under python -O)."""
    import pytest

    from hopvae_tpu.data import ArrayDataset, iterate_batches

    ds = ArrayDataset(np.zeros((10, 4, 4, 1), np.float32), np.zeros((10,), np.int64))
    with pytest.raises(ValueError, match="drop_remainder"):
        iterate_batches(ds, 4, shuffle=False, local_slice=(0, 2))
