"""Trainer integration tests: end-to-end fit, prior-phase switch, and
sharded-vs-single-device numerical equality on the 8-virtual-device CPU
mesh (SURVEY.md §4.4 — replaces the reference's nonexistent distributed
tests)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.data import get_datasets
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.parallel import mesh as mesh_lib
from hopvae_tpu.train import Trainer, make_optimizer


def _tiny_cfg(name="mnist_28", batch=16):
    cfg = load_config(name)
    cfg.batch_size = batch
    return cfg


def test_fit_trains_and_logs(tmp_path):
    cfg = _tiny_cfg()
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:64], train_ds.labels[:64]
    test_ds.images, test_ds.labels = test_ds.images[:32], test_ds.labels[:32]

    tr = Trainer(model, cfg)
    tr.fit(params, train_ds, test_ds, epochs=2, out_dir=str(tmp_path))

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    train_recs = [l for l in lines if "Train Reconstruction Error" in l]
    assert len(train_recs) == 2
    assert all(np.isfinite(l["Train Reconstruction Error"]) for l in train_recs)
    assert any("Test Reconstruction Error" in l for l in lines)
    assert (tmp_path / "epoch0000_reconstructions.png").exists()
    assert (tmp_path / "MNIST-28.ckpt.msgpack").exists()


def test_prior_phase_switch(tmp_path):
    """epoch > prior_start flips fit_prior and freezes non-prior params
    (main.py:113-116 semantics)."""
    cfg = _tiny_cfg("pixelcnn_mnist_28", batch=8)
    cfg.prior_start = 0  # switch at epoch 1
    cfg.prior_num_filters = 12
    cfg.prior_num_res_blocks = 1
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:16], train_ds.labels[:16]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    tr = Trainer(model, cfg)
    enc_before = None

    # capture encoder params entering phase 2 by running epoch 0 then 1
    p1, _ = tr.fit(params, train_ds, test_ds, epochs=1, out_dir=str(tmp_path / "a"))
    p1 = jax.device_get(p1)  # snapshot: fit donates param buffers
    enc_before = p1["encoder"]["conv_1"]["kernel"]
    prior_b = p1["prior"]["conv_in"]["kernel"]
    p2, _ = tr.fit(p1, train_ds, test_ds, epochs=2, start_epoch=1, out_dir=str(tmp_path / "b"))
    enc_after = jax.device_get(p2["encoder"]["conv_1"]["kernel"])
    prior_a = jax.device_get(p2["prior"]["conv_in"]["kernel"])

    lines = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
    assert any(l.get("fit_prior") for l in lines), "phase switch never happened"
    np.testing.assert_array_equal(enc_before, enc_after)  # frozen in phase 2
    assert not np.array_equal(prior_b, prior_a)  # prior actually trains


def test_no_phase_switch_for_parameterless_prior(tmp_path):
    """prior="None" + low prior_start (the reference ffhq_32 shape, where
    the reference crashes on an empty Adam param list): the switch is
    skipped and the model keeps training."""
    cfg = _tiny_cfg()
    cfg.prior_start = 0
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    tr = Trainer(model, cfg)
    before = jax.device_get(params["encoder"]["conv_1"]["kernel"])
    p2, _ = tr.fit(params, train_ds, test_ds, epochs=3, out_dir=str(tmp_path))
    after = jax.device_get(p2["encoder"]["conv_1"]["kernel"])
    assert not np.array_equal(before, after), "model must keep training"
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert not any(l.get("fit_prior") for l in lines)


def test_pattern_sharding_matches_replicated():
    """Model-axis sharding of the Hopfield pattern memories must not change
    the forward numerics (XLA reduces the attention over the sharded M
    axis with collectives)."""
    assert jax.device_count() >= 8
    cfg = _tiny_cfg(batch=8)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 28, 28, 1), dtype=np.float32)
    )

    outs = []
    for shard_patterns, n_model in ((False, 1), (True, 2)):
        mesh = mesh_lib.make_mesh(
            n_data=4 if n_model == 2 else 8, n_model=n_model, devices=jax.devices()[:8]
        )
        p = mesh_lib.shard_params(mesh, jax.device_get(params), shard_patterns=shard_patterns)
        bx = mesh_lib.shard_batch(mesh, x)
        xr, aux = jax.jit(lambda p, x: model.forward(p, x))(p, bx)
        outs.append((np.asarray(xr), float(aux)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=2e-5, atol=1e-6)
    assert outs[0][1] == pytest.approx(outs[1][1], rel=2e-5)


def test_sharded_sampling_matches_unsharded():
    """AR sampling with the batch sharded over the data axis must produce
    the same draws as unsharded (deterministic PRNG, batch-parallel scan)."""
    assert jax.device_count() >= 8
    cfg = _tiny_cfg("pixelcnn_mnist_28", batch=8)
    cfg.representation_dim = 4
    cfg.prior_num_filters = 12
    cfg.prior_num_res_blocks = 1
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    ref = np.asarray(model.sample(params, key, num_samples=8))

    mesh = mesh_lib.make_mesh(devices=jax.devices()[:8])
    p = mesh_lib.shard_params(mesh, jax.device_get(params))
    from jax.sharding import NamedSharding, PartitionSpec as P

    out_sh = NamedSharding(mesh, P("data"))
    f = jax.jit(
        lambda p, k: model.sample(p, k, num_samples=8), out_shardings=out_sh
    )
    got = np.asarray(f(p, key))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_matches_single_device():
    """The same train step on a 1-device and an 8-device mesh must agree —
    the real pjit path on fake CPU devices."""
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    cfg = _tiny_cfg(batch=16)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 28, 28, 1), dtype=np.float32)

    results = []
    for devs in (jax.devices()[:1], jax.devices()[:8]):
        mesh = mesh_lib.make_mesh(devices=devs)
        tr = Trainer(model, cfg, mesh=mesh)
        tr._tx = {False: make_optimizer(cfg, 1, prior_only=False, params=params)}
        p = mesh_lib.shard_params(mesh, jax.device_get(params))
        opt = tr._tx[False].init(p)
        bx = mesh_lib.shard_batch(mesh, jnp.asarray(x))
        for _ in range(2):
            p, opt, m = tr.train_step(False)(p, opt, bx)
        results.append((jax.device_get(p["encoder"]["conv_1"]["kernel"]), float(m["loss"])))

    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5, atol=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=2e-5)


def test_pallas_sharded_matches_single_device():
    """impl='pallas' on a multi-device mesh routes the bottleneck through
    shard_map (XLA cannot partition a Pallas call); the train step must
    match the single-device pallas step, including the parameter-grad psum
    inserted by the shard_map transpose. Interpret mode (CPU backend)."""
    from jax.experimental.pallas import tpu as pltpu

    assert jax.device_count() >= 8
    cfg = _tiny_cfg(batch=8)
    # interpreter-mode Pallas is slow; shrink every extensive axis
    cfg.num_embeddings = 64
    cfg.num_hiddens = 32
    model = HopVAE(cfg, impl="pallas")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 28, 28, 1), dtype=np.float32)

    results = []
    with pltpu.force_tpu_interpret_mode():
        for devs in (jax.devices()[:1], jax.devices()[:8]):
            model.mesh = None  # Trainer re-sets it for multi-device meshes
            mesh = mesh_lib.make_mesh(devices=devs)
            tr = Trainer(model, cfg, mesh=mesh)
            assert (model.mesh is not None) == (len(devs) > 1)
            tr._tx = {False: make_optimizer(cfg, 1, prior_only=False, params=params)}
            p = mesh_lib.shard_params(mesh, jax.device_get(params))
            opt = tr._tx[False].init(p)
            bx = mesh_lib.shard_batch(mesh, jnp.asarray(x))
            p, opt, m = tr.train_step(False)(p, opt, bx)
            results.append(
                (jax.device_get(p["hopfield"]["lookup_weights"]), float(m["loss"]))
            )
    model.mesh = None

    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5, atol=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=2e-5)


def test_pallas_pattern_sharded_matches_single_device():
    """impl='pallas' + shard_patterns: the pattern memories live M/n_model
    per device and the kernel's flash stats are log-sum-exp-merged across
    the model axis. A train step on a (2 data, 2 model) mesh must equal the
    single-device pallas step — forward merge, backward (same kernels fed
    the global stats), and every transpose-inserted psum. M=96 on 2 shards
    exercises the per-shard padding + masking path too."""
    from jax.experimental.pallas import tpu as pltpu

    assert jax.device_count() >= 8
    cfg = _tiny_cfg(batch=8)
    cfg.num_embeddings = 96  # 48 per shard -> padded, masked blocks
    cfg.num_hiddens = 32
    model = HopVAE(cfg, impl="pallas")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 28, 28, 1), dtype=np.float32)

    results = []
    with pltpu.force_tpu_interpret_mode():
        for devs, n_model, shard in (
            (jax.devices()[:1], 1, False),
            (jax.devices()[:4], 2, True),
        ):
            model.mesh = None
            model.shard_patterns = False
            mesh = mesh_lib.make_mesh(
                n_data=len(devs) // n_model, n_model=n_model, devices=devs
            )
            tr = Trainer(model, cfg, mesh=mesh, shard_patterns=shard)
            tr._tx = {False: make_optimizer(cfg, 1, prior_only=False, params=params)}
            p = mesh_lib.shard_params(mesh, jax.device_get(params), shard_patterns=shard)
            opt = tr._tx[False].init(p)
            bx = mesh_lib.shard_batch(mesh, jnp.asarray(x))
            p, opt, m = tr.train_step(False)(p, opt, bx)
            results.append(
                (jax.device_get(p["hopfield"]["lookup_weights"]), float(m["loss"]))
            )
    model.mesh = None
    model.shard_patterns = False

    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5, atol=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=2e-5)


def test_watch_gradients_logs_norms_and_histograms(tmp_path):
    """watch_gradients (the reference's wandb.watch(log='all') equivalent,
    main.py:109) must log a global grad norm, per-module norms, and
    grad/param log-magnitude histograms."""
    from hopvae_tpu.train import HIST_BINS

    cfg = _tiny_cfg()
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    n_enc_grads = sum(
        np.size(l) for l in jax.tree_util.tree_leaves(params["encoder"])
    )
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    tr = Trainer(model, cfg)
    tr.watch_gradients = True
    tr.fit(params, train_ds, test_ds, epochs=1, out_dir=str(tmp_path))
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    rec = next(l for l in lines if "grad_norm" in l)
    assert rec["grad_norm"] > 0
    assert rec["grad_norm/encoder"] > 0
    assert rec["grad_norm/decoder"] > 0
    # dead post_vq_conv gets zero grads; prior is parameterless here
    assert rec["grad_norm/post_vq_conv"] == 0.0
    # histograms: counts sum to n_values x n_steps (grads) / n_values (params)
    n_steps = 32 // cfg.batch_size
    assert len(rec["grad_hist/encoder"]) == HIST_BINS
    assert sum(rec["grad_hist/encoder"]) == n_enc_grads * n_steps
    assert sum(rec["param_hist/encoder"]) == n_enc_grads
    # a zero-grad module piles all counts into the bottom (log10≈-12) bin
    assert rec["grad_hist/post_vq_conv"][0] == sum(rec["grad_hist/post_vq_conv"])


def test_pallas_sharded_handles_partial_batches():
    """eval sweeps hit final batches not divisible by the data axis; the
    shard_map wrapper must pad/slice instead of crashing (review finding)."""
    from jax.experimental.pallas import tpu as pltpu

    assert jax.device_count() >= 8
    cfg = _tiny_cfg(batch=8)
    cfg.num_embeddings = 64
    cfg.num_hiddens = 32
    model = HopVAE(cfg, impl="pallas")
    params = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:8])
    tr = Trainer(model, cfg, mesh=mesh)
    assert model.mesh is not None
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((5, 28, 28, 1), dtype=np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        p = mesh_lib.shard_params(mesh, jax.device_get(params))
        # evaluate feeds host batches directly (no shard_batch); the
        # shard_map wrapper pads inside forward
        xr, mse, _ = tr.eval_step(p, x)
        assert xr.shape == x.shape
        assert np.isfinite(float(mse))
    # a later 1-device Trainer must clear the shard_map routing
    Trainer(model, cfg, mesh=mesh_lib.make_mesh(devices=jax.devices()[:1]))
    assert model.mesh is None
    model.mesh = None


def test_shard_batch_callback_path_matches_device_put(monkeypatch):
    """The multi-process branch of shard_batch (make_array_from_callback,
    untestable with real multi-host here) must place identical values with
    identical sharding — forced on a single process by patching
    process_count."""
    mesh = mesh_lib.make_mesh()
    x = np.arange(8 * 4 * 4 * 1, dtype=np.float32).reshape(8, 4, 4, 1)
    direct = mesh_lib.shard_batch(mesh, x)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    via_callback = mesh_lib.shard_batch(mesh, x)
    assert direct.sharding == via_callback.sharding
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_callback))


def test_apply_overrides_parses_and_warns(capsys):
    """--set parses literals, warns on unknown keys (typo guard), allows
    config-dependent new keys, and rejects malformed pairs."""
    from hopvae_tpu.train import apply_overrides

    cfg = load_config("mnist_28")
    apply_overrides(cfg, ["learning_rate=2e-3", "prior_start=7"], config_name="mnist_28")
    assert cfg.learning_rate == 2e-3 and cfg.prior_start == 7
    assert capsys.readouterr().err == ""

    apply_overrides(cfg, ["learing_rate=5"], config_name="mnist_28")  # typo
    assert "warning: --set learing_rate" in capsys.readouterr().err

    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


def test_multihost_save_guard_and_atomicity(monkeypatch, tmp_path):
    """Only process 0 writes checkpoints (workers on shared storage must
    not race on the same file), and writes go through temp + atomic
    rename (no partial file is ever visible under the final name)."""
    cfg = _tiny_cfg(batch=4)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tr = Trainer(model, cfg)
    tr._tx = {False: make_optimizer(cfg, 1, prior_only=False, params=params)}
    opt = tr._tx[False].init(params)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    tr.save(params, opt, 3, str(tmp_path))
    assert list(tmp_path.iterdir()) == []  # non-zero process: no writes

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    tr.save(params, opt, 3, str(tmp_path))
    names = {p.name for p in tmp_path.iterdir()}
    assert names == {"MNIST-28.ckpt.msgpack", "MNIST-28.optstate.msgpack", "MNIST-28.meta.json"}
    assert not any(".tmp-" in n for n in names)  # renames completed
    assert json.load(open(tmp_path / "MNIST-28.meta.json"))["epoch"] == 3

    # the written checkpoint round-trips under the strict resume loader
    from hopvae_tpu.utils.checkpoint import load_params

    restored = load_params(str(tmp_path / "MNIST-28.ckpt.msgpack"), jax.device_get(params))
    np.testing.assert_array_equal(
        np.asarray(restored["pre_vq_conv"]["kernel"]),
        np.asarray(params["pre_vq_conv"]["kernel"]),
    )


def test_process_batch_bounds_partition():
    """Across all processes, the per-process slices must tile [0, B)
    exactly; single-process = the full batch."""
    mesh = mesh_lib.make_mesh()  # all 8 virtual devices on data axis
    assert mesh_lib.process_batch_bounds(mesh, 16) == (0, 16)
    # a 1-device mesh too
    mesh1 = mesh_lib.make_mesh(devices=jax.devices()[:1])
    assert mesh_lib.process_batch_bounds(mesh1, 8) == (0, 8)


def test_local_slice_iteration_and_assembly(monkeypatch):
    """iterate_batches(local_slice=...) + shard_batch(global_batch=...)
    must reproduce the full-batch path's global array values: simulate two
    processes by slicing [0, B/2) and [B/2, B) and interleaving."""
    cfg = _tiny_cfg(batch=8)
    train_ds, _, _ = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    mesh = mesh_lib.make_mesh()

    full = [
        bx
        for bx, _ in __import__("hopvae_tpu.data", fromlist=["iterate_batches"]).iterate_batches(
            train_ds, 8, shuffle=True, seed=7, drop_remainder=True
        )
    ]
    halves = []
    for lo, hi in ((0, 4), (4, 8)):
        halves.append(
            [
                bx
                for bx, _ in __import__(
                    "hopvae_tpu.data", fromlist=["iterate_batches"]
                ).iterate_batches(
                    train_ds, 8, shuffle=True, seed=7, drop_remainder=True,
                    local_slice=(lo, hi),
                )
            ]
        )
    for f, a, b in zip(full, halves[0], halves[1]):
        np.testing.assert_array_equal(f, np.concatenate([a, b]))

    # forced multi-process: the process-local assembly path must place the
    # same values/sharding as the direct put (single process owns the whole
    # batch, so its "local slice" is the full batch)
    direct = mesh_lib.shard_batch(mesh, full[0])
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assembled = mesh_lib.shard_batch(mesh, full[0], global_batch=8)
    assert assembled.sharding == direct.sharding
    np.testing.assert_array_equal(np.asarray(assembled), np.asarray(direct))


def test_apply_overrides_prior_keys_do_not_warn(capsys):
    """The documented transformer workflow (--set prior_d_model=... etc.)
    must not emit typo warnings (ADVICE r2)."""
    from hopvae_tpu.train import apply_overrides

    cfg = load_config("mnist_28")
    apply_overrides(
        cfg, ["prior_d_model=64", "prior_heads=2", "prior_attn=blocked"],
        config_name="mnist_28",
    )
    assert capsys.readouterr().err == ""
    assert cfg.prior_d_model == 64 and cfg.prior_attn == "blocked"


def test_device_resident_data_matches_streaming(tmp_path, monkeypatch):
    """The device-resident fast path (stage once + on-device batch gather)
    must produce bit-identical training metrics to the host-streaming
    path — same shuffle order, same math."""
    cfg = _tiny_cfg(batch=8)
    cfg.epochs = 2
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    mesh1 = mesh_lib.make_mesh(devices=jax.devices()[:1])

    def run(out, enabled):
        monkeypatch.setenv("HOPVAE_DEVICE_DATA_MAX", str((1 << 30) if enabled else 0))
        tr = Trainer(model, cfg, mesh=mesh1)
        p = jax.device_get(params)
        tr.fit(p, train_ds, test_ds, epochs=2, out_dir=str(out), eval_every=10, save_every=10)
        return [
            json.loads(l)["Train Reconstruction Error"]
            for l in open(out / "metrics.jsonl")
            if "Train Reconstruction Error" in l
        ]

    fast = run(tmp_path / "fast", True)
    slow = run(tmp_path / "slow", False)
    assert len(fast) == 2
    # same data, same shuffle order, same step math; the on-device gather
    # may fuse/reorder reductions differently than the host-fed step, so
    # allow last-bit float drift
    np.testing.assert_allclose(fast, slow, rtol=1e-5)


def test_device_resident_data_multi_device(tmp_path, monkeypatch):
    """The device-resident epoch path on a multi-device mesh (dataset
    staged replicated, per-batch gather local, batch resharded over the
    data axis by the scan body's sharding constraint) must match the
    single-device device-resident metrics — same shuffle, same math,
    just sharded. Covers both a pure data mesh and a (data, model) mesh."""
    cfg = _tiny_cfg(batch=8)
    cfg.epochs = 2
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    monkeypatch.setenv("HOPVAE_DEVICE_DATA_MAX", str(1 << 30))

    def run(out, mesh):
        tr = Trainer(model, cfg, mesh=mesh)
        assert tr._device_data(train_ds) is not None  # fast path engaged
        p = jax.device_get(params)
        tr.fit(p, train_ds, test_ds, epochs=2, out_dir=str(out), eval_every=10, save_every=10)
        return [
            json.loads(l)["Train Reconstruction Error"]
            for l in open(out / "metrics.jsonl")
            if "Train Reconstruction Error" in l
        ]

    ref = run(tmp_path / "d1", mesh_lib.make_mesh(devices=jax.devices()[:1]))
    d8 = run(tmp_path / "d8", mesh_lib.make_mesh())           # 8-way data
    d42 = run(tmp_path / "d42", mesh_lib.make_mesh(n_model=2))  # (4, 2)
    assert len(ref) == 2
    np.testing.assert_allclose(d8, ref, rtol=1e-5)
    np.testing.assert_allclose(d42, ref, rtol=1e-5)


def test_fit_retraces_on_watch_toggle_and_lr_change(tmp_path):
    """The compiled-step cache is keyed on watch_gradients and the
    optimizer inputs: toggling watch between fit() calls must produce
    grad_norm records in the second run (review finding: a stale cached
    step traced with watch=False silently never logged them)."""
    cfg = _tiny_cfg()
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    train_ds, _, test_ds = get_datasets(cfg, None)
    train_ds.images, train_ds.labels = train_ds.images[:32], train_ds.labels[:32]
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]

    tr = Trainer(model, cfg)
    params, _ = tr.fit(params, train_ds, test_ds, epochs=1,
                       out_dir=str(tmp_path / "a"), eval_every=0, save_every=0)
    lines = [json.loads(l) for l in open(tmp_path / "a" / "metrics.jsonl")]
    assert not any("grad_norm" in l for l in lines)
    key_before = tr._tx_key

    tr.watch_gradients = True
    params, _ = tr.fit(params, train_ds, test_ds, epochs=1,
                       out_dir=str(tmp_path / "b"), eval_every=0, save_every=0)
    assert tr._tx_key != key_before  # cache invalidated, step re-traced
    lines = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
    assert any("grad_norm" in l for l in lines)

    # mutating optimizer inputs on cfg between fits also invalidates
    cfg.learning_rate *= 0.5
    key_watch = None if not hasattr(tr, "_tx_key") else tr._tx_key
    params, _ = tr.fit(params, train_ds, test_ds, epochs=1,
                       out_dir=str(tmp_path / "c"), eval_every=0, save_every=0)
    assert tr._tx_key != key_watch


def test_metric_logger_writes_only_on_process_zero(monkeypatch, tmp_path):
    """Multi-host: every process constructs a MetricLogger over the same
    shared out_dir — only process 0 may append (review finding: N
    duplicate JSONL records per epoch)."""
    from hopvae_tpu.utils.metrics import MetricLogger

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lg = MetricLogger(str(tmp_path / "w"))
    lg.log({"loss": 1.0})
    assert not (tmp_path / "w" / "metrics.jsonl").exists()

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    lg = MetricLogger(str(tmp_path / "w"))
    lg.log({"loss": 1.0})
    recs = [json.loads(l) for l in open(tmp_path / "w" / "metrics.jsonl")]
    assert len(recs) == 1 and recs[0]["loss"] == 1.0


def test_sharded_transformer_prior_phase_matches_single_device():
    """The Transformer-prior PRIOR-phase train step (prior-only optimizer,
    blocked attention's nested scans) must agree between a 1-device and an
    8-device mesh — the third prior family under real pjit sharding."""
    assert jax.device_count() >= 8
    cfg = _tiny_cfg("pixelcnn_mnist_28", batch=16)
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_layers = 2
    cfg.prior_attn = "blocked"
    cfg.prior_q_block = 64
    cfg.prior_kv_block = 32
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((16, 28, 28, 1)).astype(np.float32)

    results = []
    for devs in (jax.devices()[:1], jax.devices()[:8]):
        mesh = mesh_lib.make_mesh(devices=devs)
        tr = Trainer(model, cfg, mesh=mesh)
        tr._tx = {True: make_optimizer(cfg, 1, prior_only=True, params=params)}
        p = mesh_lib.shard_params(mesh, jax.device_get(params))
        opt = tr._tx[True].init(p)
        bx = mesh_lib.shard_batch(mesh, jnp.asarray(x))
        for _ in range(2):
            p, opt, m = tr.train_step(True)(p, opt, bx)
        results.append(
            (
                jax.device_get(p["prior"]["blocks"][0]["qkv"]["kernel"]),
                jax.device_get(p["encoder"]["conv_1"]["kernel"]),
                float(m["loss"]),
            )
        )

    # prior weights trained identically; encoder frozen identically
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(results[0][1], results[1][1])
    assert results[0][2] == pytest.approx(results[1][2], rel=2e-5)


def test_evaluate_device_accumulation_matches_per_batch_sum(tmp_path):
    """The single-fetch eval sweep (per-batch MSEs stacked on device,
    fetched once — round-4) must return the same value as the old
    per-batch ``float()`` host sum, ragged tail included."""
    cfg = _tiny_cfg(batch=8)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    _, _, test_ds = get_datasets(cfg, None)
    test_ds.images, test_ds.labels = test_ds.images[:20], test_ds.labels[:20]  # 8+8+4

    tr = Trainer(model, cfg)
    err = tr.evaluate(params, test_ds, out_dir=str(tmp_path), epoch=0)

    from hopvae_tpu.data import iterate_batches

    total = 0.0
    for bx, _ in iterate_batches(test_ds, cfg.batch_size, shuffle=False):
        _, mse, _ = tr.eval_step(params, bx)
        total += float(mse)
    np.testing.assert_allclose(err, total / len(test_ds), rtol=1e-6)
    assert (tmp_path / "epoch0000_reconstructions.png").exists()


def test_multihost_evaluate_inside_fit(monkeypatch, tmp_path):
    """Forced 2-process fit (VERDICT r3 #2): evaluate shards the sweep like
    fit (local_slice + shard_batch), reduces the recon MSE globally, and
    logs ONE correct 'Test Reconstruction Error' — equal to the
    single-process value on the same data."""
    def _run(out):
        cfg = _tiny_cfg(batch=8)
        model = HopVAE(cfg)
        params = model.init(jax.random.PRNGKey(0))
        train_ds, _, test_ds = get_datasets(cfg, None)
        train_ds.images, train_ds.labels = train_ds.images[:16], train_ds.labels[:16]
        test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]
        tr = Trainer(model, cfg)
        tr.fit(params, train_ds, test_ds, epochs=1, out_dir=out,
               eval_every=1, save_every=0)
        recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
        return [r["Test Reconstruction Error"] for r in recs
                if "Test Reconstruction Error" in r]

    single = _run(str(tmp_path / "single"))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    multi = _run(str(tmp_path / "multi"))
    assert len(single) == len(multi) == 1
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-5)
    assert (tmp_path / "multi" / "epoch0000_reconstructions.png").exists()
    assert (tmp_path / "multi" / "epoch0000_interpolations.png").exists()


def test_multihost_evaluate_nonzero_process_writes_nothing(monkeypatch, tmp_path):
    """On a slice, non-zero processes run the same collectives but write
    no grids (shared out_dir: one writer — same contract as save)."""
    cfg = _tiny_cfg(batch=8)
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    _, _, test_ds = get_datasets(cfg, None)
    test_ds.images, test_ds.labels = test_ds.images[:16], test_ds.labels[:16]
    tr = Trainer(model, cfg)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    err = tr.evaluate(params, test_ds, out_dir=str(tmp_path), epoch=0)
    assert np.isfinite(err)
    assert list(tmp_path.iterdir()) == []


def test_production_flag_resolves_impl_and_dtype(monkeypatch):
    """--production = --impl pallas --compute-dtype bfloat16 in one flag
    (VERDICT r3 #8); explicit flags override it; defaults stay on the f32
    XLA parity path."""
    import hopvae_tpu.train as T

    captured = {}

    class _Stop(Exception):
        pass

    def fake_hopvae(config, impl=None, compute_dtype=None):
        captured.update(impl=impl, dtype=compute_dtype)
        raise _Stop

    monkeypatch.setattr(T, "HopVAE", fake_hopvae)
    for argv, impl, dt in (
        (["--production"], "pallas", jnp.bfloat16),
        ([], "xla", None),
        (["--production", "--compute-dtype", "float32"], "pallas", None),
        (["--impl", "xla", "--production"], "xla", jnp.bfloat16),
    ):
        with pytest.raises(_Stop):
            T.main(["--config", "mnist_28"] + argv)
        assert (captured["impl"], captured["dtype"]) == (impl, dt), argv
