"""Benchmark — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): FFHQ-64 reconstruction images/sec/chip on
the local TPU, vs the CPU reference implementation (the torch mirror of
the reference model — the reference itself cannot run here: its hflayers/
torchvision deps are absent). Target: ≥5× (BASELINE.md).

Side metrics (stderr + BENCH_DETAILS.json): MNIST-28 recon and train-step
images/sec, PixelCNN samples/sec via the on-device lax.scan sampler, and
the golden checkpoint recon-MSE.

CPU baseline is measured once and cached in ``tools/cpu_baseline.json``
(torch single-process CPU, batch 32, forward only — the reference's eval
path). Delete the file to re-measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_FILE = os.path.join(REPO, "tools", "cpu_baseline.json")


def _walltime(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure_cpu_baseline(batch: int = 32, iters: int = 5) -> float:
    """torch-CPU reference-equivalent FFHQ-64 forward, images/sec."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch_mirror

    from hopvae_tpu.config import load_config

    cfg = load_config("ffhq_64")
    h, res = cfg.num_hiddens, cfg.num_residual_hiddens
    d, di, m = cfg.embedding_dim, cfg.index_dim, cfg.num_embeddings

    def conv(o, i, k):
        return torch.randn(o, i, k, k) * 0.05

    sd = {}
    for idx, (o, i, k) in enumerate(
        [(h // 2, cfg.num_channels, 4), (h, h // 2, 4), (h, h, 4), (h, h, 3)], 1
    ):
        sd[f"encoder.conv_{idx}.weight"] = conv(o, i, k)
        sd[f"encoder.conv_{idx}.bias"] = torch.zeros(o)
    for stack in ("encoder.residual_stack", "decoder.residual_stack"):
        for j in range(cfg.num_residual_layers):
            sd[f"{stack}._layers.{j}._block.1.weight"] = conv(res, h, 3)
            sd[f"{stack}._layers.{j}._block.3.weight"] = conv(h, res, 1)
    sd["pre_vq_conv.weight"], sd["pre_vq_conv.bias"] = conv(d, h, 1), torch.zeros(d)
    for name, (i_dim, o_dim) in {
        "hopfield": (d, d),
        "embedding_to_index": (d, di),
        "index_to_embedding": (di, d),
    }.items():
        core = f"{name}.hopfield"
        sd[f"{name}.lookup_weights"] = torch.randn(1, m, i_dim)
        sd[f"{core}.association_core.in_proj_weight"] = torch.randn(i_dim, i_dim) * 0.1
        sd[f"{core}.association_core.in_proj_bias"] = torch.zeros(i_dim)
        sd[f"{core}.association_core.out_proj.weight"] = torch.randn(o_dim, i_dim) * 0.1
        sd[f"{core}.association_core.out_proj.bias"] = torch.zeros(o_dim)
        for ln in ("norm_stored_pattern", "norm_state_pattern", "norm_pattern_projection"):
            sd[f"{core}.{ln}.weight"] = torch.ones(i_dim)
            sd[f"{core}.{ln}.bias"] = torch.zeros(i_dim)
    sd["decoder.conv_1.weight"], sd["decoder.conv_1.bias"] = conv(h, d, 3), torch.zeros(h)
    for idx, (i, o) in enumerate([(h, h // 2), (h // 2, h // 2), (h // 2, cfg.num_channels)], 1):
        sd[f"decoder.conv_trans_{idx}.weight"] = torch.randn(i, o, 4, 4) * 0.05
        sd[f"decoder.conv_trans_{idx}.bias"] = torch.zeros(o)

    x = torch.randn(batch, cfg.num_channels, 64, 64)
    with torch.no_grad():
        torch_mirror.forward(sd, x, cfg.num_levels, cfg.representation_dim, d)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            torch_mirror.forward(sd, x, cfg.num_levels, cfg.representation_dim, d)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    import jax

    # persistent compile cache: the tunneled backend compiles slowly (the
    # 192-step AR-sampling scan alone takes ~4.5 min cold); cache makes
    # bench re-runs start in seconds
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

    details = {"device": str(jax.devices()[0])}

    # ---- CPU reference baseline (cached) --------------------------------
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cpu = json.load(f)
    else:
        ips = measure_cpu_baseline()
        cpu = {"ffhq64_recon_images_per_sec_cpu": ips, "note": "torch mirror, 1 CPU core, batch 32"}
        os.makedirs(os.path.dirname(BASELINE_FILE), exist_ok=True)
        with open(BASELINE_FILE, "w") as f:
            json.dump(cpu, f, indent=1)
    cpu_ips = cpu["ffhq64_recon_images_per_sec_cpu"]
    details["cpu_baseline_images_per_sec"] = cpu_ips

    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    # ---- headline: FFHQ-64 recon images/sec/chip ------------------------
    # recon maps images -> images, so the timing chain feeds each output
    # back as the next input (true serial device time; see utils/benchmark).
    # Headline is the production path (bf16 conv stacks + streaming Pallas
    # bottleneck — golden recon-MSE delta 0.2% vs f32, BASELINE.md); the
    # f32 parity path is also recorded.
    cfg = load_config("ffhq_64")
    batch = 256
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((batch, 64, 64, 3), np.float32))

    dt = device_seconds_per_iter(lambda s: model.forward(params, s)[0], x)
    details["ffhq64_recon_images_per_sec_tpu_f32"] = batch / dt

    bmodel = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
    dt = device_seconds_per_iter(lambda s: bmodel.forward(params, s)[0], x)
    tpu_ips = batch / dt
    details["ffhq64_recon_images_per_sec_tpu"] = tpu_ips
    details["ffhq64_recon_batch"] = batch
    details["ffhq64_recon_config"] = "bf16 conv stacks + streaming Pallas bottleneck"

    # ---- side: FFHQ-64-scaled (4096 patterns): parity path vs production
    # (at this memory size the bottleneck dominates; streaming Pallas
    # kernel + bf16 convs is ~3x the best XLA path)
    scfg = load_config("ffhq_64_scaled")
    for impl, sdt, name in (
        ("xla", None, "xla_f32"),
        ("pallas", jnp.bfloat16, "pallas_bf16"),
    ):
        smodel = HopVAE(scfg, impl=impl, compute_dtype=sdt)
        sparams = smodel.init(jax.random.PRNGKey(0))
        dt = device_seconds_per_iter(
            lambda s: smodel.forward(sparams, s)[0], x, iters=10
        )
        details[f"ffhq64_scaled_recon_images_per_sec_{name}"] = batch / dt

    # ---- side: FFHQ-64 train step (f32 parity + bf16 production) --------
    # training stays on the XLA impl: one fused autodiff graph beats
    # pallas-forward + recompute-backward (25k vs 21k img/s)
    import optax

    tx = optax.adam(1e-3)
    tr_bf16 = HopVAE(cfg, compute_dtype=jnp.bfloat16)
    for tmodel, name in ((model, "f32"), (tr_bf16, "bf16")):

        def train_step(state, tmodel=tmodel):
            p, o = state

            def loss_fn(p):
                xr, aux = tmodel.forward(p, x)
                return jnp.mean((xr - x) ** 2) + aux

            _, g = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o

        dt = device_seconds_per_iter(train_step, (params, tx.init(params)), iters=10)
        details[f"ffhq64_train_images_per_sec_tpu_{name}"] = batch / dt

    # ---- side: MNIST-28 golden recon MSE + throughput -------------------
    mcfg = load_config("mnist_28")
    mmodel = HopVAE(mcfg)
    mparams = mmodel.init(jax.random.PRNGKey(0))
    mparams = load_reference_checkpoint(
        mmodel, mparams, "/root/reference/checkpoints/MNIST-28.ckpt"
    )
    from hopvae_tpu.data import render_digits

    digits, _ = render_digits(256, 28, seed=0)
    mx = jnp.asarray((digits.astype(np.float32) / 255.0 - 0.1307) / 0.3081)[..., None]
    mrecon = jax.jit(lambda p, x: mmodel.forward(p, x))
    xr, aux = mrecon(mparams, mx)
    details["mnist28_golden_recon_mse"] = float(jnp.mean((xr - mx) ** 2))
    details["mnist28_golden_aux_loss"] = float(aux)
    dt = device_seconds_per_iter(lambda s: mmodel.forward(mparams, s)[0], mx)
    details["mnist28_recon_images_per_sec_tpu"] = 256 / dt

    # ---- side: PixelCNN samples/sec (on-device scan) --------------------
    pcfg = load_config("pixelcnn_mnist_28")
    pmodel = HopVAE(pcfg)
    pparams = pmodel.init(jax.random.PRNGKey(0))
    n_samp = 1024  # throughput metric: big-batch serving scenario (BASELINE.md)

    sample_fn = jax.jit(lambda k: jnp.sum(pmodel.sample(pparams, k, n_samp)))
    float(sample_fn(jax.random.PRNGKey(0)))  # compile (slow cold; cached after)
    # tunnel roundtrip overhead: fetching a trivial jitted scalar
    trivial = jax.jit(lambda k: jnp.sum(k))
    float(trivial(jax.random.PRNGKey(0)))
    rt = min(
        _walltime(lambda: float(trivial(jax.random.PRNGKey(i)))) for i in range(3)
    )
    dt = min(
        _walltime(lambda: float(sample_fn(jax.random.PRNGKey(i)))) for i in range(1, 4)
    )
    details["tunnel_roundtrip_sec"] = rt
    details["pixelcnn_samples_per_sec_tpu"] = n_samp / max(dt - rt, 1e-9)

    with open(os.path.join(REPO, "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps(details, indent=1), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "FFHQ-64 recon images/sec/chip",
                "value": round(tpu_ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(tpu_ips / cpu_ips, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
