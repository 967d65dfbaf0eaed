"""Benchmark — prints ONE JSON line for the driver, headline FIRST.

Headline metric (BASELINE.json): FFHQ-64 reconstruction images/sec/chip on
the local TPU, vs the CPU reference implementation (the torch mirror of
the reference model — the reference itself cannot run here: its hflayers/
torchvision deps are absent). Target: ≥5× (BASELINE.md).

Structure (round 5 — VERDICT r4 #1/#2/#3: round 4's driver capture timed
out at rc=124 with ZERO bytes of output because the old bench was a
25-minute monolith that printed everything last):

- The headline is measured FIRST and its one-line JSON printed to stdout
  (flushed) as soon as it exists — a later timeout can no longer erase it.
- Every section flushes ``BENCH_DETAILS.json`` atomically when it
  finishes; a mid-run kill degrades to a partial record, never to nothing.
- ``BENCH_BUDGET_SECS`` (default 600) bounds the run: sections are ordered
  cheap/important → expensive, and any section that would start past the
  budget is recorded in ``skipped_sections`` instead of run. Set it large
  (e.g. 100000) for a full record.
- SIGTERM/SIGINT write the partial details with ``"truncated": true`` and
  exit 0 if the headline already went out (``timeout N python bench.py``
  leaves a valid record).
- Quality/numerics gates no longer ``assert`` mid-run: failures are
  recorded as ``gate_failed_*`` keys and the process exits 3 at the END —
  all measured metrics survive a red gate.

Section inventory and the provenance of every number: BASELINE.md (the
JSON written here is that file's single source of truth).

CPU baseline is measured once and cached in ``tools/cpu_baseline.json``
(torch single-process CPU, batch 32, forward only — the reference's eval
path). Delete the file to re-measure.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_FILE = os.path.join(REPO, "tools", "cpu_baseline.json")
DETAILS_FILE = os.path.join(REPO, "BENCH_DETAILS.json")
BUDGET_SECS = float(os.environ.get("BENCH_BUDGET_SECS", "600"))

T0 = time.perf_counter()
details: dict = {}
gate_failures: list = []
_headline_printed = False


def _elapsed() -> float:
    return time.perf_counter() - T0


def _flush() -> None:
    """Atomically persist whatever has been measured so far.

    Thread-safe against the watchdog thread: ``dict(details)`` is one
    C-level copy under the GIL, so ``json.dump`` never iterates a dict
    the other thread is resizing."""
    details["bench_elapsed_secs"] = round(_elapsed(), 1)
    details["bench_budget_secs"] = BUDGET_SECS
    if gate_failures:
        details["gate_failures"] = list(gate_failures)
    snap = dict(details)
    tmp = DETAILS_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1)
    os.replace(tmp, DETAILS_FILE)


def _gate(name: str, ok: bool, message: str) -> None:
    """Record a quality/numerics gate. A failure no longer aborts the run
    (VERDICT r4 weak #1): it is recorded and turns the FINAL exit code
    nonzero, so all other metrics survive."""
    if not ok:
        gate_failures.append(name)
        details[f"gate_failed_{name}"] = message
        print(f"GATE FAILED [{name}]: {message}", file=sys.stderr)


def _on_signal(signum, frame):  # pragma: no cover - exercised by timeout
    details["truncated"] = True
    details["truncated_signal"] = int(signum)
    _flush()
    # exit 0 only for a CLEAN truncation: the driver has its headline and
    # no quality gate failed before the kill. A recorded gate failure must
    # surface as exit 3 even when the run is cut short (the docstring's
    # contract); no-headline truncation stays exit 1.
    if not _headline_printed:
        sys.exit(1)
    sys.exit(3 if gate_failures else 0)


def _walltime(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure_cpu_baseline(batch: int = 32, iters: int = 5) -> float:
    """torch-CPU reference-equivalent FFHQ-64 forward, images/sec."""
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


# ---------------------------------------------------------------------------
# Shared lazy context: sections may be skipped by the budget, so anything
# two sections share is built on first use and cached here.
# ---------------------------------------------------------------------------
ctx: dict = {}


def _ffhq64(ctx):
    """FFHQ-64 production + parity models, params, batch-256 input."""
    if "cfg" not in ctx:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from hopvae_tpu.config import load_config
        from hopvae_tpu.models.hopvae import HopVAE

        cfg = load_config("ffhq_64")
        ctx["cfg"] = cfg
        ctx["batch"] = 256
        ctx["model"] = HopVAE(cfg)
        ctx["bmodel"] = HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16)
        ctx["params"] = ctx["model"].init(jax.random.PRNGKey(0))
        ctx["x"] = jnp.asarray(
            np.random.default_rng(0).standard_normal((256, 64, 64, 3), np.float32)
        )
    return ctx


def _ffhq128(ctx):
    if "lcfg" not in ctx:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from hopvae_tpu.config import load_config
        from hopvae_tpu.models.hopvae import HopVAE

        lcfg = load_config("ffhq_128")
        ctx["lcfg"] = lcfg
        ctx["lmodel"] = HopVAE(lcfg, impl="pallas", compute_dtype=jnp.bfloat16)
        ctx["lparams"] = ctx["lmodel"].init(jax.random.PRNGKey(0))
        # recon batch 128 is the swept optimum (2026-08-18: 8.8k/21.4k/24.6k/
        # 21.8k img/s at 32/64/128/256); training stays at 64 (memory)
        ctx["rx"] = jnp.asarray(
            np.random.default_rng(2).standard_normal((128, 128, 128, 3), np.float32)
        )
        ctx["lx"] = ctx["rx"][:64]
    return ctx


def _sampler_step(sample_fn):
    """Chain sampler applications by folding the drawn samples back into
    the key — device-true timing (wall-minus-roundtrip timing of single
    calls varied ±40% between runs on the tunneled backend)."""
    import jax
    import jax.numpy as jnp

    def step(k):
        s = sample_fn(k)
        return jax.random.fold_in(k, jnp.sum(s).astype(jnp.int32))

    return step


def _bits_of(logits, grid):
    import jax
    import jax.numpy as jnp

    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = grid.astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.mean(ce) * jnp.log2(jnp.exp(1.0)))


def _int8_cache_quality(ctx, tag, config_name, ckpt_name, image_size, rep,
                        logit_err_tol):
    """Teacher-forced f32-vs-int8 KV-cache bits on a TRAINED checkpoint.

    int8 is the decode auto-default at S>=512, which engages at BOTH
    shipped large geometries — r=33 (Transformer-FFHQ-128) and r=17
    (Transformer-FFHQ-64). VERDICT r4 #3: the r=17 point was a one-off
    (commit 17810e4: bits 0.77115 f32 vs 0.77107 int8, 3.1%-of-max logit
    err); both are now standing gates, measured every bench run on grids
    encoded from the hermetic synthetic-FFHQ split by the trained
    backbone (the token statistics the prior actually models).
    """
    import jax
    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.data import get_datasets
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.ops.bottleneck import bottleneck_params, hopfield_bottleneck_xla
    from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

    qcfg = load_config(config_name)
    qcfg.prior = "Transformer"
    qmodel = HopVAE(qcfg)
    qparams = qmodel.init(jax.random.PRNGKey(0))
    qparams = load_reference_checkpoint(
        qmodel, qparams, os.path.join(REPO, "checkpoints", ckpt_name)
    )
    _, _, test_split = get_datasets(qcfg, None)
    qx = jnp.asarray(test_split.images[:8])
    assert qx.shape[1] == image_size, (qx.shape, image_size)
    qz = jax.jit(qmodel._encode_to_tokens)(qparams, qx)
    _, qzq, _ = jax.jit(
        lambda p, t: hopfield_bottleneck_xla(p, t, qcfg.num_levels)
    )(bottleneck_params(qparams), qz)
    qgrid = qzq.reshape(8, rep, rep, qcfg.index_dim)
    lg32 = jax.jit(lambda p, g: qmodel.prior.decode_logits(p, g))(qparams["prior"], qgrid)
    lg8 = jax.jit(lambda p, g: qmodel.prior.decode_logits(p, g, cache_dtype=jnp.int8))(
        qparams["prior"], qgrid
    )
    logit_err = float(jnp.max(jnp.abs(lg8 - lg32)) / jnp.max(jnp.abs(lg32)))
    bits32, bits8 = _bits_of(lg32, qgrid), _bits_of(lg8, qgrid)
    details[f"int8_cache_{tag}_logit_err_frac_of_max"] = logit_err
    details[f"int8_cache_{tag}_bits_f32"] = bits32
    details[f"int8_cache_{tag}_bits_int8"] = bits8
    _gate(f"int8_{tag}_logit_err", logit_err < logit_err_tol,
          f"int8 {tag} logit error {logit_err} >= {logit_err_tol}")
    _gate(f"int8_{tag}_bits_drift", abs(bits8 - bits32) < 0.05,
          f"int8 {tag} bits drift {bits8} vs {bits32}")


# ---------------------------------------------------------------------------
# Sections (ordered cheap/important → expensive; budget cuts the tail)
# ---------------------------------------------------------------------------

def sec_headline(ctx):
    """Production FFHQ-64 recon throughput → the driver's one JSON line."""
    global _headline_printed
    import jax

    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    # CPU reference baseline (cached)
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
    details["device"] = str(jax.devices()[0])

    c = _ffhq64(ctx)
    # recon maps images -> images, so the timing chain feeds each output
    # back as the next input (true serial device time; see utils/benchmark).
    # Headline is the production path (bf16 conv stacks + streaming Pallas
    # bottleneck — golden recon-MSE delta 0.2% vs f32, BASELINE.md).
    dt = device_seconds_per_iter(
        lambda s: c["bmodel"].forward(c["params"], s)[0], c["x"], iters=30, repeats=4
    )
    tpu_ips = c["batch"] / dt
    details["ffhq64_recon_images_per_sec_tpu"] = tpu_ips
    details["ffhq64_recon_batch"] = c["batch"]
    details["ffhq64_recon_config"] = "bf16 conv stacks + streaming Pallas bottleneck"

    print(
        json.dumps(
            {
                "metric": "FFHQ-64 recon images/sec/chip",
                "value": round(tpu_ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(tpu_ips / cpu_ips, 2),
            }
        ),
        flush=True,
    )
    _headline_printed = True


def sec_recon_f32(ctx):
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq64(ctx)
    dt = device_seconds_per_iter(lambda s: c["model"].forward(c["params"], s)[0], c["x"])
    details["ffhq64_recon_images_per_sec_tpu_f32"] = c["batch"] / dt


def sec_golden_mnist(ctx):
    """Converted-checkpoint golden recon-MSE (conversion-fidelity anchor)
    + MNIST-28 recon throughput."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hopvae_tpu.config import load_config
    from hopvae_tpu.data import render_digits
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter
    from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

    mcfg = load_config("mnist_28")
    mmodel = HopVAE(mcfg)
    mparams = mmodel.init(jax.random.PRNGKey(0))
    mparams = load_reference_checkpoint(
        mmodel, mparams, "/root/reference/checkpoints/MNIST-28.ckpt"
    )
    digits, _ = render_digits(256, 28, seed=0)
    mx = jnp.asarray((digits.astype(np.float32) / 255.0 - 0.1307) / 0.3081)[..., None]
    xr, aux = jax.jit(lambda p, x: mmodel.forward(p, x))(mparams, mx)
    golden = float(jnp.mean((xr - mx) ** 2))
    details["mnist28_golden_recon_mse"] = golden
    details["mnist28_golden_aux_loss"] = float(aux)
    # the golden values themselves are a standing gate: conversion or
    # semantics drift shows up here first (committed: 0.00734 / 3.7e-5)
    _gate("mnist28_golden_recon_mse", abs(golden - 0.00734) < 0.002,
          f"golden recon MSE drifted: {golden} vs committed 0.00734")
    dt = device_seconds_per_iter(lambda s: mmodel.forward(mparams, s)[0], mx)
    details["mnist28_recon_images_per_sec_tpu"] = 256 / dt


def sec_kernel_numerics(ctx):
    """On-hardware streaming-Pallas vs XLA gate (VERDICT r1 #4): Mosaic
    tiling/masking must be exact on the REAL chip, not just
    interpreter-exact. f32 HIGHEST, M=512, values and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hopvae_tpu.ops.bottleneck import bottleneck_params, hopfield_bottleneck_xla
    from hopvae_tpu.ops.hopfield_pallas import hopfield_bottleneck_pallas

    c = _ffhq64(ctx)
    cfg = c["cfg"]
    hi = jax.lax.Precision.HIGHEST
    bparams = bottleneck_params(c["params"])
    tok = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (4, cfg.representation_dim**2, cfg.embedding_dim), np.float32
        )
    )
    ref_out = jax.jit(lambda p, t: hopfield_bottleneck_xla(p, t, cfg.num_levels))(bparams, tok)
    pal_out = jax.jit(lambda p, t: hopfield_bottleneck_pallas(p, t, cfg.num_levels, precision=hi))(bparams, tok)
    # gate on the pre-quantizer retrieval; zq can legitimately flip a bin
    # when a sigmoid output sits within float noise of a rounding boundary
    # (summation order differs), and r inherits any flip — report those
    # separately, gate r only when no bin flipped
    fwd_err = float(jnp.max(jnp.abs(pal_out[0] - ref_out[0])))
    zq_flips = int(jnp.sum(pal_out[1] != ref_out[1]))
    details["pallas_hw_fwd_max_abs_err_f32"] = fwd_err
    details["pallas_hw_zq_bin_flips"] = zq_flips
    _gate("pallas_fwd", fwd_err < 1e-5, f"on-hardware forward numerics: {fwd_err}")
    _gate("pallas_zq_flips", zq_flips <= 4, f"quantizer disagreement beyond boundary noise: {zq_flips}")
    if zq_flips == 0:
        r_err = float(jnp.max(jnp.abs(pal_out[2] - ref_out[2])))
        details["pallas_hw_roundtrip_max_abs_err_f32"] = r_err
        _gate("pallas_roundtrip", r_err < 1e-5, f"round-trip numerics: {r_err}")

    def _bn_loss(impl_fn):
        def f(p, t):
            e, zq, r = impl_fn(p, t)
            return jnp.mean((r - e) ** 2) + jnp.mean(e) + 1e-4 * jnp.mean(zq)
        return f

    g_ref = jax.jit(jax.grad(_bn_loss(lambda p, t: hopfield_bottleneck_xla(p, t, cfg.num_levels))))(bparams, tok)
    g_pal = jax.jit(jax.grad(_bn_loss(lambda p, t: hopfield_bottleneck_pallas(p, t, cfg.num_levels, precision=hi))))(bparams, tok)
    gscale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g_ref))
    bwd_err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(g_pal), jax.tree_util.tree_leaves(g_ref))
    )
    details["pallas_hw_bwd_max_abs_err_f32"] = bwd_err
    details["pallas_hw_bwd_grad_scale"] = gscale
    _gate("pallas_bwd", bwd_err < 1e-4 * max(gscale, 1.0),
          f"on-hardware gradient: {bwd_err} vs scale {gscale}")


def sec_prior_quality(ctx):
    """Standing prior-quality contract (VERDICT r3 #4): teacher-forced bits
    for the SHIPPED prior checkpoints on a held-out rendered-digit split
    (seed=1; deterministic, hermetic). bits = aux(fit_prior=True) -
    aux(fit_prior=False): the cross-entropy term exactly as trained
    (HopVAE.py:282-285 semantics). Expected values measured on this chip
    2026-08-18; window ±0.1 bits (TPU reorder drift is ~1e-3 here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hopvae_tpu.config import load_config
    from hopvae_tpu.data import render_digits
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

    hdigits, _ = render_digits(256, 28, seed=1)
    hx = jnp.asarray((hdigits.astype(np.float32) / 255.0 - 0.1307) / 0.3081)[..., None]
    for qname, qckpt, qprior, qexpect in (
        ("pixelcnn", "PixelCNN-MNIST-28.msgpack", "PixelCNN", 1.2084),
        ("transformer", "Transformer-MNIST-28.msgpack", "Transformer", 0.0856),
    ):
        qcfg = load_config("pixelcnn_mnist_28")
        qcfg.prior = qprior
        qmodel = HopVAE(qcfg)
        qp = qmodel.init(jax.random.PRNGKey(0))
        qp = load_reference_checkpoint(
            qmodel, qp, os.path.join(REPO, "checkpoints", qckpt)
        )
        aux_t = jax.jit(lambda p, s, m=qmodel: m.forward(p, s, fit_prior=True)[1])(qp, hx)
        aux_f = jax.jit(lambda p, s, m=qmodel: m.forward(p, s)[1])(qp, hx)
        qbits = float(aux_t) - float(aux_f)
        details[f"prior_quality_bits_{qname}_mnist28"] = qbits
        _gate(f"prior_quality_{qname}", abs(qbits - qexpect) < 0.1,
              f"{qname} prior quality drifted: {qbits} vs committed {qexpect}")


def sec_int8_quality_r17(ctx):
    # measured 2026-08-19 (commit 17810e4): logit err 3.1% of max, bits
    # 0.77115 f32 vs 0.77107 int8 — tolerance 0.08 is ~2.5× the measured err
    _int8_cache_quality(ctx, "r17", "ffhq_64_scaled", "Transformer-FFHQ-64.msgpack",
                        64, 17, logit_err_tol=0.08)


def sec_int8_quality_r33(ctx):
    # measured 2026-08-18: logit err ~1.6%, bits 0.62024 f32 vs 0.62043 int8
    _int8_cache_quality(ctx, "r33", "ffhq_128", "Transformer-FFHQ-128.msgpack",
                        128, 33, logit_err_tol=0.05)


def sec_scaled_recon(ctx):
    """FFHQ-64-scaled (4096 patterns): parity path vs production. At this
    memory size the bottleneck dominates; streaming Pallas + bf16 convs is
    ~4.7× the best XLA path."""
    import jax
    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq64(ctx)
    scfg = load_config("ffhq_64_scaled")
    ctx["scfg"] = scfg
    for impl, sdt, name in (
        ("xla", None, "xla_f32"),
        ("pallas", jnp.bfloat16, "pallas_bf16"),
    ):
        smodel = HopVAE(scfg, impl=impl, compute_dtype=sdt)
        sparams = smodel.init(jax.random.PRNGKey(0))
        # repeats=5: the scaled-config numbers are the noisiest on the
        # tunneled chip (94k-126k img/s across bench runs at repeats=2)
        dt = device_seconds_per_iter(
            lambda s: smodel.forward(sparams, s)[0], c["x"], iters=10, repeats=5
        )
        details[f"ffhq64_scaled_recon_images_per_sec_{name}"] = c["batch"] / dt
    ctx["smodel"], ctx["sparams"] = smodel, sparams  # pallas variant


def sec_ffhq128_recon(ctx):
    """FFHQ-128 (33×33 latent grid, 4096 patterns) — scale-up config with
    no reference counterpart: 1089 tokens against the scaled memory."""
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq128(ctx)
    dt = device_seconds_per_iter(
        lambda s: c["lmodel"].forward(c["lparams"], s)[0], c["rx"], iters=10
    )
    details["ffhq128_recon_images_per_sec_tpu"] = 128 / dt
    details["ffhq128_recon_batch"] = 128


def sec_train_ffhq64(ctx):
    """Train step (full grads + Adam, batch 256). production = impl=pallas
    + bf16: the fused Pallas backward (flash-style stat-recompute kernels,
    no (N,M) attention matrix in HBM) beats XLA autodiff at every memory
    size (M=512: 1.3×, M=4096: 2.7×)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq64(ctx)
    cfg, x, params, batch = c["cfg"], c["x"], c["params"], c["batch"]
    tx = optax.adam(1e-3)
    ctx["tx"] = tx
    for tmodel, name in (
        (HopVAE(cfg), "f32"),
        (HopVAE(cfg, compute_dtype=jnp.bfloat16), "bf16_xla"),
        (HopVAE(cfg, impl="pallas", compute_dtype=jnp.bfloat16), "bf16"),
    ):

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


def sec_train_scaled(ctx):
    """Scaled config (4096 patterns): the bottleneck dominates training;
    the Pallas backward is where the 2.7× lives."""
    import jax
    import jax.numpy as jnp
    import optax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq64(ctx)
    x, batch = c["x"], c["batch"]
    scfg = ctx.get("scfg") or load_config("ffhq_64_scaled")
    tx = ctx.get("tx") or optax.adam(1e-3)
    for impl, name in (("xla", "xla"), ("pallas", "pallas")):
        stmodel = HopVAE(scfg, impl=impl, compute_dtype=jnp.bfloat16)
        ssparams = stmodel.init(jax.random.PRNGKey(0))

        def strain_step(state, stmodel=stmodel):
            p, o = state

            def loss_fn(p):
                xr, aux = stmodel.forward(p, x)
                return jnp.mean((xr - x) ** 2) + aux

            _, g = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o

        dt = device_seconds_per_iter(
            strain_step, (ssparams, tx.init(ssparams)), iters=10, repeats=5
        )
        details[f"ffhq64_scaled_train_images_per_sec_bf16_{name}"] = batch / dt


def sec_train_ffhq128(ctx):
    """FFHQ-128 train step (production path): 1089 tokens against the
    4096-pattern memory — the fused backward's token-grid regime."""
    import jax
    import jax.numpy as jnp
    import optax

    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq128(ctx)
    lmodel, lparams, lx = c["lmodel"], c["lparams"], c["lx"]
    tx = ctx.get("tx") or optax.adam(1e-3)

    def ltrain_step(state):
        p, o = state

        def loss_fn(p):
            xr, aux = lmodel.forward(p, lx)
            return jnp.mean((xr - lx) ** 2) + aux

        _, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    dt = device_seconds_per_iter(ltrain_step, (lparams, tx.init(lparams)), iters=5, repeats=4)
    details["ffhq128_train_images_per_sec_bf16_pallas"] = 64 / dt


def sec_latency(ctx):
    """Serving latency (batch 1/8/64, production path): device time per
    reconstruction at the shapes InferenceEngine AOT-compiles; wall latency
    additionally pays the tunnel's ~30 ms roundtrip, an environment
    artifact excluded by the chained-loop harness. ≥12k chained device
    iterations per estimate, p50 + spread over 3 independent estimates
    (VERDICT r2 weak #3: the old 500-iter estimate was jitter-bracketed)."""
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    c = _ffhq64(ctx)
    for lb, iters in ((1, 2000), (8, 1000), (64, 500)):
        ests = sorted(
            device_seconds_per_iter(
                lambda s: c["bmodel"].forward(c["params"], s)[0],
                c["x"][:lb], iters=iters, repeats=3,
            )
            for _ in range(3)
        )
        details[f"ffhq64_recon_batch{lb}_device_latency_ms_p50"] = ests[1] * 1e3
        details[f"ffhq64_recon_batch{lb}_device_latency_ms_spread"] = [
            ests[0] * 1e3, ests[-1] * 1e3
        ]
    details["ffhq64_recon_batch1_device_latency_ms"] = details[
        "ffhq64_recon_batch1_device_latency_ms_p50"
    ]


def sec_pixelcnn_sampler(ctx):
    """PixelCNN samples/sec via the on-device column-incremental exact
    sampler. Batch swept 2026-08-17: r=8 keeps scaling to 4096."""
    import jax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    pcfg = load_config("pixelcnn_mnist_28")
    pmodel = HopVAE(pcfg)
    pparams = pmodel.init(jax.random.PRNGKey(0))
    ctx["pcfg"] = pcfg

    # tunnel roundtrip overhead, recorded for context
    import jax.numpy as jnp

    trivial = jax.jit(lambda k: jnp.sum(k))
    float(trivial(jax.random.PRNGKey(0)))
    details["tunnel_roundtrip_sec"] = min(
        _walltime(lambda: float(trivial(jax.random.PRNGKey(i)))) for i in range(3)
    )
    n_samp = 4096
    dt = device_seconds_per_iter(
        _sampler_step(lambda k: pmodel.sample(pparams, k, n_samp)),
        jax.random.PRNGKey(0),
        iters=5,
    )
    details["pixelcnn_samples_per_sec_tpu"] = n_samp / dt


def sec_transformer_samplers(ctx):
    """Transformer prior KV-cached decode (the capacity option; PixelCNN
    remains the throughput sampler): r=8, r=17 bf16, r=17 int8."""
    import jax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    pcfg = ctx.get("pcfg") or load_config("pixelcnn_mnist_28")
    tf_prior = TransformerPrior(pcfg)
    tf_params = tf_prior.init(jax.random.PRNGKey(0))
    tdt = device_seconds_per_iter(
        _sampler_step(lambda k: tf_prior.sample(tf_params, k, 1024)),
        jax.random.PRNGKey(0),
        iters=3,
    )
    details["transformer_prior_samples_per_sec_tpu"] = 1024 / tdt

    # the scaled geometry (r=17, S=867): the grid where the blocked
    # training attention + segmented decode make the transformer family
    # usable end-to-end (VERDICT r2 #1/#5)
    tcfg17 = load_config("pixelcnn_mnist_28")
    tcfg17.representation_dim = 17
    tcfg17.num_levels = 512
    tcfg17.prior_cache_dtype = "bfloat16"  # pin: auto is int8 at S>=512
    tf17 = TransformerPrior(tcfg17)
    tf17_params = tf17.init(jax.random.PRNGKey(0))
    t17 = device_seconds_per_iter(
        _sampler_step(lambda k: tf17.sample(tf17_params, k, 2048)),
        jax.random.PRNGKey(0),
        iters=3,
    )
    details["transformer_prior_r17_samples_per_sec_tpu"] = 2048 / t17

    # the int8 KV-cache option (per-token absmax; transformer.py decode
    # notes): same geometry, half the cache bytes again vs bf16
    tcfg17q = load_config("pixelcnn_mnist_28")
    tcfg17q.representation_dim = 17
    tcfg17q.num_levels = 512
    tcfg17q.prior_cache_dtype = "int8"
    tf17q = TransformerPrior(tcfg17q)
    t17q = device_seconds_per_iter(
        _sampler_step(lambda k: tf17q.sample(tf17_params, k, 2048)),
        jax.random.PRNGKey(0),
        iters=3,
    )
    details["transformer_prior_r17_int8_samples_per_sec_tpu"] = 2048 / t17q


def sec_scaled_ar_sampler(ctx):
    """Scaled-config AR sampling (r=17, 4096-level prior grid): the
    column-incremental PixelCNN sampler's headline (VERDICT r1 #6)."""
    import jax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    if "smodel" in ctx:
        smodel, sparams = ctx["smodel"], ctx["sparams"]
    else:
        import jax.numpy as jnp

        scfg = ctx.get("scfg") or load_config("ffhq_64_scaled")
        smodel = HopVAE(scfg, impl="pallas", compute_dtype=jnp.bfloat16)
        sparams = smodel.init(jax.random.PRNGKey(0))
    sprior_params = sparams["prior"]
    s_n = 2048
    sdt = device_seconds_per_iter(
        _sampler_step(lambda k: smodel.prior.sample(sprior_params, k, s_n)),
        jax.random.PRNGKey(0),
        iters=3,
    )
    details["ffhq64_scaled_ar_samples_per_sec"] = s_n / sdt
    details["ffhq64_scaled_ar_sample_batch"] = s_n


def sec_r33_pixelcnn_sampler(ctx):
    """The largest-grid PixelCNN sampler (33×33×3, 512 levels) — the
    throughput AR sampler at the r=33 geometry (the transformer decode is
    the capacity option). Round 5's parity double buffer made this
    monotone in batch; bench at the swept near-peak B=2048 (B=4096 adds
    ~6% but doubles the draw time; see BASELINE 'PixelCNN-sampler
    bound')."""
    import jax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    lcfg = ctx["lcfg"] if "lcfg" in ctx else load_config("ffhq_128")
    lpmodel = HopVAE(lcfg)  # prior defaults to PixelCNN at this config
    lp_prior = lpmodel.init(jax.random.PRNGKey(0))["prior"]
    n = 2048
    dt = device_seconds_per_iter(
        _sampler_step(lambda k: lpmodel.prior.sample(lp_prior, k, n)),
        jax.random.PRNGKey(0),
        iters=3,
    )
    details["pixelcnn_r33_samples_per_sec_tpu"] = n / dt
    details["pixelcnn_r33_sample_batch"] = n


def sec_flash_gate(ctx):
    """On-hardware flash-attention numerics gate (VERDICT r3 #1): the
    Mosaic flash kernel is the production TRAINING path for the
    Transformer prior at S>=512 (prior_attn=auto), but off-TPU it falls
    back to blocked — the CPU suite never exercises the actual kernel.
    Values AND grads vs the blocked XLA backend, f32, at the real prior
    geometries S=867 (r=17) and S=3267 (r=33) — both non-multiples of 128,
    exercising the end-padding claim — at h=1 (dh=128) and h=4 (dh=32).
    Tolerances calibrated on-hardware 2026-08-18 (fwd drift ~9e-4 abs at
    O(3) outputs, grad ~0.6% of max grad — pure TPU default-precision
    reordering; asserts carry ~5× headroom; a masking or padding bug
    presents as O(1) errors)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hopvae_tpu.ops.attention import blocked_causal_attention, flash_causal_attention

    for s, h in ((867, 1), (867, 4), (3267, 1), (3267, 4)):
        dh = 128 // h
        arng = np.random.default_rng(s * 10 + h)
        q, k, v, w = (
            jnp.asarray(arng.standard_normal((4, s, h, dh)), jnp.float32)
            for _ in range(4)
        )
        ob = jax.jit(blocked_causal_attention)(q, k, v)
        of = jax.jit(flash_causal_attention)(q, k, v)
        aerr = float(jnp.max(jnp.abs(ob - of)))
        details[f"pallas_hw_flash_fwd_max_abs_err_S{s}_h{h}"] = aerr
        _gate(f"flash_fwd_S{s}_h{h}", aerr < 5e-3, f"flash fwd: {aerr}")

        def _aloss(fn, w=w, s=s):
            return lambda q, k, v: jnp.sum(fn(q, k, v) * w) / s

        gb = jax.jit(jax.grad(_aloss(blocked_causal_attention), argnums=(0, 1, 2)))(q, k, v)
        gf = jax.jit(jax.grad(_aloss(flash_causal_attention), argnums=(0, 1, 2)))(q, k, v)
        agscale = max(float(jnp.max(jnp.abs(g))) for g in gb)
        agerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gb, gf))
        details[f"pallas_hw_flash_bwd_max_abs_err_S{s}_h{h}"] = agerr
        details[f"pallas_hw_flash_bwd_grad_scale_S{s}_h{h}"] = agscale
        _gate(f"flash_bwd_S{s}_h{h}", agerr < 2e-2 * agscale,
              f"flash grad: {agerr} vs scale {agscale}")
        _flush()  # each (S, h) shape costs minutes cold — persist per-shape


def sec_r33_decode(ctx):
    """The largest shipped geometry (r=33, S=3267): decode throughput for
    both cache dtypes at their per-dtype swept-optimum batches
    (tools/r33_batch_sweep.py: int8 peaks at B=1024 — batch-independent
    small-matmul overhead amortizes, 2048 regresses under HBM pressure;
    bf16 REGRESSES at 1024 — its 6.9 GB of caches hit the pressure wall
    earlier, so it stays at 256). Timing: bare jitted dispatch + scalar
    fetch, median of 3 — these draws run 3-10 s each, so the ~35 ms tunnel
    roundtrip is <1% and the chained harness (built for sub-100 ms steps)
    would just multiply minutes."""
    import jax
    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior

    def _bare_draw_seconds(sample_fn, n: int) -> float:
        fn = jax.jit(lambda k: jnp.sum(sample_fn(k, n)).astype(jnp.int32))
        fn(jax.random.PRNGKey(0)).block_until_ready()  # compile + warm
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            fn(jax.random.PRNGKey(i + 1)).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    r33_bf16_batch, r33_int8_batch = 256, 1024
    details["transformer_prior_r33_sample_batch"] = r33_bf16_batch
    details["transformer_prior_r33_int8_sample_batch"] = r33_int8_batch
    tcfg33 = load_config("ffhq_128")
    tcfg33.prior = "Transformer"
    tcfg33.prior_cache_dtype = "bfloat16"  # pin: auto is int8 at S>=512
    tf33 = TransformerPrior(tcfg33)
    tf33_params = tf33.init(jax.random.PRNGKey(0))
    t33 = _bare_draw_seconds(lambda k, n: tf33.sample(tf33_params, k, n), r33_bf16_batch)
    details["transformer_prior_r33_samples_per_sec_tpu"] = r33_bf16_batch / t33
    _flush()
    tcfg33q = load_config("ffhq_128")
    tcfg33q.prior = "Transformer"
    tcfg33q.prior_cache_dtype = "int8"
    tf33q = TransformerPrior(tcfg33q)
    t33q = _bare_draw_seconds(lambda k, n: tf33q.sample(tf33_params, k, n), r33_int8_batch)
    details["transformer_prior_r33_int8_samples_per_sec_tpu"] = r33_int8_batch / t33q


def sec_mfu(ctx):
    """MFU / roofline accounting (analytic FLOPs model, utils/flops.py) —
    pure arithmetic over whatever throughput keys exist; always runs."""
    from hopvae_tpu.config import load_config
    from hopvae_tpu.utils import flops as fl

    cfg = ctx["cfg"] if "cfg" in ctx else load_config("ffhq_64")
    scfg = ctx.get("scfg") or load_config("ffhq_64_scaled")
    lcfg = ctx["lcfg"] if "lcfg" in ctx else load_config("ffhq_128")
    fwd_fl = fl.forward_flops_per_image(cfg)
    details["ffhq64_forward_gflops_per_image"] = fwd_fl / 1e9
    pairs = (
        ("ffhq64_recon_mfu", fwd_fl, "ffhq64_recon_images_per_sec_tpu"),
        ("ffhq64_train_mfu", fl.train_flops_per_image(cfg), "ffhq64_train_images_per_sec_tpu_bf16"),
        ("ffhq64_scaled_recon_mfu", fl.forward_flops_per_image(scfg),
         "ffhq64_scaled_recon_images_per_sec_pallas_bf16"),
        ("ffhq64_scaled_train_mfu", fl.train_flops_per_image(scfg),
         "ffhq64_scaled_train_images_per_sec_bf16_pallas"),
        ("ffhq128_recon_mfu", fl.forward_flops_per_image(lcfg), "ffhq128_recon_images_per_sec_tpu"),
        ("ffhq128_train_mfu", fl.train_flops_per_image(lcfg), "ffhq128_train_images_per_sec_bf16_pallas"),
    )
    for out_key, fl_per_img, rate_key in pairs:
        if rate_key in details:
            details[out_key] = fl.mfu(fl_per_img, details[rate_key])
    if "ffhq64_scaled_recon_images_per_sec_pallas_bf16" in details:
        # the scaled bottleneck's table traffic (f32 tables) — fraction of
        # HBM peak consumed if the kernel were purely memory-bound
        details["ffhq64_scaled_bottleneck_hbm_frac"] = (
            fl.bottleneck_hbm_bytes_per_image(scfg)
            * details["ffhq64_scaled_recon_images_per_sec_pallas_bf16"]
            / fl.PEAK_HBM_BYTES
        )
    details["mfu_peak_assumption"] = "TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM"


SECTIONS = (
    # (name, fn, always_run) — ordered cheap/important → expensive, from
    # warm-cache timings (2026-08-19 driver-sim run): the sub-20s sampler
    # sections run before the ~50s train sections so a default-budget run
    # still records every headline family; the multi-minute tail
    # (transformer samplers, flash gates, r=33 decode) goes last.
    ("headline", sec_headline, True),
    ("recon_f32", sec_recon_f32, False),
    ("golden_mnist", sec_golden_mnist, False),
    ("kernel_numerics", sec_kernel_numerics, False),
    ("prior_quality", sec_prior_quality, False),
    ("pixelcnn_sampler", sec_pixelcnn_sampler, False),
    ("scaled_recon", sec_scaled_recon, False),
    ("scaled_ar_sampler", sec_scaled_ar_sampler, False),
    ("ffhq128_recon", sec_ffhq128_recon, False),
    ("r33_pixelcnn_sampler", sec_r33_pixelcnn_sampler, False),
    ("int8_quality_r17", sec_int8_quality_r17, False),
    ("int8_quality_r33", sec_int8_quality_r33, False),
    ("train_ffhq64", sec_train_ffhq64, False),
    ("train_scaled", sec_train_scaled, False),
    ("train_ffhq128", sec_train_ffhq128, False),
    ("latency", sec_latency, False),
    ("transformer_samplers", sec_transformer_samplers, False),
    ("flash_gate", sec_flash_gate, False),
    ("r33_decode", sec_r33_decode, False),
    ("mfu", sec_mfu, True),
)


def _watchdog() -> None:
    """Breadcrumbs while the main thread may be stuck in backend init or a
    remote compile (the tunneled backend wedged for >10 min on 2026-08-19
    — even ``jax.devices()`` hung): every 120 s without a completed
    section, persist a stall marker so a killed run leaves evidence of
    WHERE it died instead of an empty record. Pure observability — never
    exits; runs this slow do recover."""
    import threading

    def tick():
        while True:
            time.sleep(120)
            if details.get("section_secs"):
                return  # first section landed; normal flushing takes over
            details["watchdog_stalled_at_secs"] = round(_elapsed(), 1)
            details["watchdog_note"] = (
                "no section completed yet - backend init or first compile "
                "stalled (tunneled TPU + remote compile service)"
            )
            _flush()

    # if the run recovers, the in-progress stall marker must not read as a
    # standing failure in the final record — the section loop converts it
    # (see main): watchdog_stalled_at_secs -> watchdog_recovered_after_secs

    threading.Thread(target=tick, daemon=True).start()


def main() -> int:
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    _watchdog()

    import jax

    # persistent compile cache: the tunneled backend compiles slowly (the
    # 192-step AR-sampling scan alone takes ~4.5 min cold); cache makes
    # bench re-runs start in seconds
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    section_errors = []
    for name, fn, always in SECTIONS:
        if not always and _elapsed() > BUDGET_SECS:
            details.setdefault("skipped_sections", []).append(name)
            continue
        t_sec = time.perf_counter()
        try:
            fn(ctx)
        except Exception as e:  # noqa: BLE001 - one broken section must not
            # erase the others' metrics; recorded + nonzero exit at the end
            if name == "headline":
                raise  # without the headline there is nothing to record
            section_errors.append(name)
            details[f"section_error_{name}"] = repr(e)
            print(f"SECTION ERROR [{name}]: {e!r}", file=sys.stderr)
        details.setdefault("section_secs", {})[name] = round(
            time.perf_counter() - t_sec, 1
        )
        # the run is making progress: demote any watchdog stall marker to a
        # recovery note so a healthy-but-slow-to-start record doesn't claim
        # a standing stall
        if "watchdog_stalled_at_secs" in details:
            details["watchdog_recovered_after_secs"] = details.pop(
                "watchdog_stalled_at_secs"
            )
            details.pop("watchdog_note", None)
        _flush()

    print(json.dumps(details, indent=1), file=sys.stderr)
    if gate_failures or section_errors:
        print(
            f"bench: {len(gate_failures)} gate failure(s) {gate_failures}, "
            f"{len(section_errors)} section error(s) {section_errors}",
            file=sys.stderr,
        )
        return 3
    return 0


if __name__ == "__main__":
    rc = 1
    try:
        rc = main()
    finally:
        _flush()
    sys.exit(rc)
