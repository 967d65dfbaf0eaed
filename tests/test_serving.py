"""Serving engine: AOT compile, ragged-batch padding, CLI batch processor."""

import numpy as np

import jax

from hopvae_tpu.config import load_config
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.serving import InferenceEngine


def _engine(max_batch=8):
    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # CPU test: xla impl, f32 (pallas/bf16 is the TPU production default)
    return cfg, InferenceEngine(
        cfg, params, max_batch=max_batch, impl="xla", compute_dtype=None, n_sample=4
    )


def test_reconstruct_pads_and_unpads():
    cfg, eng = _engine()
    x = np.random.default_rng(0).standard_normal((3, 28, 28, 1)).astype(np.float32)
    y = eng.reconstruct(x)
    assert y.shape == (3, 28, 28, 1)
    # same inputs in a different batch size give identical outputs
    y2 = eng.reconstruct(x[:2])
    np.testing.assert_allclose(y[:2], y2, rtol=1e-5, atol=1e-6)


def test_reconstruct_rejects_oversize_batch():
    import pytest

    cfg, eng = _engine(max_batch=4)
    x = np.zeros((5, 28, 28, 1), np.float32)
    with pytest.raises(ValueError, match="max_batch"):
        eng.reconstruct(x)


def test_sample_and_encode_shapes():
    cfg, eng = _engine()
    s = eng.sample(seed=1)
    assert s.shape == (4, 28, 28, 1)
    x = np.zeros((2, 28, 28, 1), np.float32)
    z = eng.encode(x)
    assert z.shape == (2, cfg.representation_dim**2, cfg.embedding_dim)


def test_cli_reconstruct(tmp_path):
    from PIL import Image

    from hopvae_tpu import serving
    from hopvae_tpu.utils.checkpoint import save_params

    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.msgpack"
    save_params(str(ckpt), params)

    img = tmp_path / "digit.png"
    Image.fromarray((np.random.default_rng(0).random((28, 28)) * 255).astype(np.uint8)).save(img)

    serving.main([
        "--config", "mnist_28", "--checkpoint", str(ckpt),
        "--out", str(tmp_path / "served"),
        "--impl", "xla", "--compute-dtype", "float32",  # CPU-test path
        str(img), str(img),
    ])
    assert (tmp_path / "served" / "reconstructions.png").exists()


def test_cli_serves_transformer_prior_checkpoint(tmp_path):
    """A checkpoint saved with --set prior=Transformer must be servable:
    --set rebuilds the matching params template (review finding — without
    it, from_bytes hits a PixelCNN-vs-transformer structure mismatch)."""
    from hopvae_tpu import serving
    from hopvae_tpu.utils.checkpoint import save_params

    cfg = load_config("pixelcnn_mnist_28")
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_layers = 2
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "tf.msgpack"
    save_params(str(ckpt), params)

    serving.main([
        "--config", "pixelcnn_mnist_28", "--checkpoint", str(ckpt),
        "--set", "prior=Transformer", "--set", "prior_d_model=32",
        "--set", "prior_heads=2", "--set", "prior_layers=2",
        "--mode", "sample", "--n-sample", "2",
        "--out", str(tmp_path / "served"),
        "--impl", "xla", "--compute-dtype", "float32",
    ])
    assert (tmp_path / "served" / "samples.png").exists()


def test_prior_none_literal_accepted():
    """--set prior=None literal-evals to Python None; the factory must
    treat it as the Normal stub, not an unknown prior."""
    from hopvae_tpu.config import apply_overrides
    from hopvae_tpu.models.priors import NormalPrior, get_prior

    cfg = load_config("pixelcnn_mnist_28")
    apply_overrides(cfg, ["prior=None"])
    assert cfg.prior is None
    assert isinstance(get_prior(cfg), NormalPrior)


def test_engine_interpolate_and_op_selection():
    """interpolate produces valid images; an op left out of `ops` raises
    instead of hitting a None."""
    import pytest

    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    eng = InferenceEngine(
        cfg, params, max_batch=4, impl="xla", compute_dtype=None,
        ops=("interpolate",),
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 28, 28, 1)).astype(np.float32)
    y = rng.standard_normal((3, 28, 28, 1)).astype(np.float32)
    z = eng.interpolate(x, y)
    assert z.shape == (3, 28, 28, 1) and np.isfinite(z).all()
    with pytest.raises(ValueError, match="equal batch"):
        eng.interpolate(x, y[:2])
    with pytest.raises(RuntimeError, match="reconstruct"):
        eng.reconstruct(x)


def test_cli_interpolate(tmp_path):
    """--mode interpolate: first half ↔ second half of the inputs
    (reference eval surface, main.py:69,76)."""
    from PIL import Image

    from hopvae_tpu import serving
    from hopvae_tpu.utils.checkpoint import save_params

    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.msgpack"
    save_params(str(ckpt), params)

    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        p = tmp_path / f"d{i}.png"
        Image.fromarray((rng.random((28, 28)) * 255).astype(np.uint8)).save(p)
        files.append(str(p))

    serving.main([
        "--config", "mnist_28", "--checkpoint", str(ckpt),
        "--mode", "interpolate", "--out", str(tmp_path / "served"),
        "--impl", "xla", "--compute-dtype", "float32",
        *files,
    ])
    assert (tmp_path / "served" / "interpolations.png").exists()

    import pytest

    with pytest.raises(SystemExit):  # odd count rejected
        serving.main([
            "--config", "mnist_28", "--checkpoint", str(ckpt),
            "--mode", "interpolate", "--out", str(tmp_path / "served2"),
            "--impl", "xla", "--compute-dtype", "float32",
            *files[:3],
        ])


def test_cli_chunks_past_max_batch(tmp_path):
    """Input counts beyond the engine's max_batch are chunked through it in
    BOTH reconstruct and interpolate modes (round-3 review: interpolate
    passed whole halves in one call and raised in _pad past 256 pairs)."""
    from PIL import Image

    from hopvae_tpu import serving
    from hopvae_tpu.utils.checkpoint import save_params

    cfg = load_config("mnist_28")
    params = HopVAE(cfg).init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.msgpack"
    save_params(str(ckpt), params)

    rng = np.random.default_rng(0)
    files = []
    for i in range(6):
        p = tmp_path / f"d{i}.png"
        Image.fromarray((rng.random((28, 28)) * 255).astype(np.uint8)).save(p)
        files.append(str(p))

    base = ["--config", "mnist_28", "--checkpoint", str(ckpt),
            "--impl", "xla", "--compute-dtype", "float32", "--max-batch", "2"]
    serving.main(base + ["--mode", "interpolate",
                         "--out", str(tmp_path / "si"), *files])  # 3 pairs > 2
    assert (tmp_path / "si" / "interpolations.png").exists()
    serving.main(base + ["--mode", "reconstruct",
                         "--out", str(tmp_path / "sr"), *files])  # 6 > 2
    assert (tmp_path / "sr" / "reconstructions.png").exists()


def test_cli_validates_inputs_before_compiling(monkeypatch, tmp_path):
    """Bad input counts must abort BEFORE InferenceEngine pays the AOT
    compile (review finding)."""
    import pytest

    from hopvae_tpu import serving
    from hopvae_tpu.utils.checkpoint import save_params

    cfg = load_config("mnist_28")
    params = HopVAE(cfg).init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.msgpack"
    save_params(str(ckpt), params)

    def boom(*a, **k):
        raise AssertionError("engine compiled before input validation")

    monkeypatch.setattr(serving, "InferenceEngine", boom)
    base = ["--config", "mnist_28", "--checkpoint", str(ckpt), "--impl", "xla"]
    with pytest.raises(SystemExit):
        serving.main(base + ["--mode", "interpolate", "a.png", "b.png", "c.png"])
    with pytest.raises(SystemExit):
        serving.main(base + ["--mode", "reconstruct"])
