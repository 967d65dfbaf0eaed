"""Resume-from-checkpoint semantics (SURVEY.md §5.4) and the bf16 compute
path's numerical sanity."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.data import get_datasets
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.train import Trainer


def _tiny(cfg):
    cfg.batch_size = 16
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]
    return train_ds, test_ds


def test_resume_continues_epoch_and_params(tmp_path):
    cfg = load_config("mnist_28")
    train_ds, test_ds = _tiny(cfg)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))

    host_params = jax.device_get(params)  # snapshot: fit donates buffers
    tr = Trainer(model, cfg)
    tr.fit(params, train_ds, test_ds, epochs=1, out_dir=str(tmp_path), save_every=1)
    meta = json.load(open(tmp_path / "MNIST-28.meta.json"))
    assert meta["epoch"] == 0

    # resume: must start at epoch 1 and from saved params (not the fresh ones)
    tr2 = Trainer(model, cfg)
    fresh = model.init(jax.random.PRNGKey(123))
    p2, _ = tr2.fit(
        fresh, train_ds, test_ds, epochs=2, out_dir=str(tmp_path), resume=True, save_every=1
    )
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    epochs_logged = [l["epoch"] for l in lines if "Train Reconstruction Error" in l]
    assert epochs_logged.count(1.0) == 1 and epochs_logged.count(0.0) == 1  # 0 from run1, 1 from run2
    meta = json.load(open(tmp_path / "MNIST-28.meta.json"))
    assert meta["epoch"] == 1


def test_bf16_compute_path_close_to_f32():
    cfg = load_config("mnist_28")
    m32 = HopVAE(cfg)
    m16 = HopVAE(cfg, compute_dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    r32, a32 = m32.forward(params, x)
    r16, a16 = m16.forward(params, x)
    assert r16.dtype == jnp.float32  # outputs come back f32
    # bf16 conv error is bounded (~1% relative on activations)
    assert float(jnp.mean((r16 - r32) ** 2)) < 1e-3
    np.testing.assert_allclose(float(a16), float(a32), rtol=0.2)
