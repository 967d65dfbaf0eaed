"""Measure the native-int4 (XLA S4) KV-cache decode option on the TPU.

Question (round 4): int8 caches are the r>=17 decode default — the step is
~90% cache-read bound — so 4-bit codes would halve the bytes again IF the
backend physically packs two codes per byte in HBM.  jnp.int4 exists and
is functionally correct (tests/test_transformer_prior.py); whether it
PACKS is a backend property this script measures directly:

1. allocation probe: device bytes_in_use delta for a (256, 3267, 4, 32)
   cache in int8 vs int4 — packed int4 shows ~half the int8 delta;
2. decode throughput at the bench geometries (r=33 batch 256, r=17 batch
   2048), int8 vs int4, same chained-harness timing as bench.py.

Verdict goes to BASELINE.md; int4 stays a supported option either way
(it is exact API-wise), but only becomes recommended if >=1.3x int8.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior
    from hopvae_tpu.utils.benchmark import device_seconds_per_iter

    dev = jax.devices()[0]
    print("device:", dev)

    # ---- allocation probe: does S4 pack in HBM? -------------------------
    # device.memory_stats() is None on the axon backend, so ask XLA's
    # buffer assignment instead: compile a function whose live output is
    # the cache and read memory_analysis (same probe style as the round-3
    # blocked-attention memory bound, BASELINE.md).
    shape = (256, 3267, 4, 32)

    def out_bytes(dtype):
        # NB: materializing an S4 scalar eagerly trips a JAX recursion bug
        # on this backend — pass int32 and cast inside the traced fn.
        c = jax.jit(lambda x: jnp.zeros(shape, dtype) + x.astype(dtype)).lower(
            jnp.zeros((), jnp.int32)
        ).compile()
        return int(c.memory_analysis().output_size_in_bytes)

    d8, d4 = out_bytes(jnp.int8), out_bytes(jnp.int4)
    print(f"alloc probe {shape}: int8 {d8/2**20:.1f} MiB, int4 {d4/2**20:.1f} MiB "
          f"-> int4/int8 ratio {d4/max(d8,1):.2f} (0.5 = packed, 1.0 = unpacked)")

    # ---- decode throughput, bench.py geometries -------------------------
    def _sampler_step(sample_fn):
        def step(k):
            s = sample_fn(k)
            return jax.random.fold_in(k, jnp.sum(s).astype(jnp.int32))

        return step

    results = {}
    for tag, conf, rep, batch, iters in (
        ("r17", "pixelcnn_mnist_28", 17, 2048, 3),
        ("r33", "ffhq_128", 33, 256, 2),
    ):
        for cdt in ("int8", "int4"):
            cfg = load_config(conf)
            cfg.prior = "Transformer"
            cfg.representation_dim = rep
            cfg.num_levels = 512
            cfg.prior_cache_dtype = cdt
            prior = TransformerPrior(cfg)
            params = prior.init(jax.random.PRNGKey(0))
            dt = device_seconds_per_iter(
                _sampler_step(lambda k: prior.sample(params, k, batch)),
                jax.random.PRNGKey(0),
                iters=iters,
            )
            results[f"{tag}_{cdt}"] = batch / dt
            print(f"{tag} {cdt}: {batch / dt:.1f} samples/s")
    for tag in ("r17", "r33"):
        print(f"{tag} int4/int8 speedup: {results[f'{tag}_int4'] / results[f'{tag}_int8']:.2f}x")

    # ---- quality on the trained r=33 checkpoint (only matters if fast) ---
    # same protocol as bench.py's int8_cache_r33_* gate: teacher-forced
    # logits through the decode path on grids encoded from the hermetic
    # synthetic-FFHQ split by the trained backbone.
    from hopvae_tpu.data import get_datasets
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.ops.bottleneck import bottleneck_params, hopfield_bottleneck_xla
    from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

    cfg = load_config("ffhq_128")
    cfg.prior = "Transformer"
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = load_reference_checkpoint(
        model, params, os.path.join(REPO, "checkpoints", "Transformer-FFHQ-128.msgpack")
    )
    _, _, test = get_datasets(cfg, None)
    qx = jnp.asarray(test.images[:8])
    qz = jax.jit(model._encode_to_tokens)(params, qx)
    _, qzq, _ = jax.jit(lambda p, t: hopfield_bottleneck_xla(p, t, cfg.num_levels))(
        bottleneck_params(params), qz
    )
    qgrid = qzq.reshape(8, 33, 33, cfg.index_dim)
    lg32 = jax.jit(lambda p, g: model.prior.decode_logits(p, g))(params["prior"], qgrid)

    def bits_of(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = qgrid.astype(jnp.int32)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return float(jnp.mean(ce) * jnp.log2(jnp.exp(1.0)))

    for cdt in (jnp.int8, jnp.int4):
        lgq = jax.jit(
            lambda p, g, cdt=cdt: model.prior.decode_logits(p, g, cache_dtype=cdt)
        )(params["prior"], qgrid)
        err = float(jnp.max(jnp.abs(lgq - lg32)) / jnp.max(jnp.abs(lg32)))
        print(
            f"r33 trained-ckpt {cdt.__name__}: logit err {err:.4f} of max, "
            f"bits {bits_of(lgq):.5f} vs f32 {bits_of(lg32):.5f}"
        )


if __name__ == "__main__":
    main()
