"""Sweep the sampling batch for the r=33 int8 transformer decode.

tools/decode_step_profile.py (2026-08-18) showed the decode step is
0.38-0.59 ms/step of batch-independent small-op latency ("rest": QKV/out/
MLP/head matmuls at d=128) on top of the bandwidth-proportional cache
read.  Larger sampling batches amortize the rest; the cache read scales
linearly, so throughput should rise toward the pure-read cap
(~128 samples/s at batch->inf).  HBM check: int8 caches at B=2048,
L=3267 are 4 layers x 2 x 2048·3267·144 B ~ 7.7 GB — fits the 16 GB v5e.

Timing: bare jitted dispatch + scalar fetch (multi-second kernels — the
chained harness is for sub-100 ms steps; memory note 2026-08-18).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.priors.transformer import TransformerPrior

    print("device:", jax.devices()[0])

    cfg = load_config("ffhq_128")
    cfg.prior = "Transformer"
    cfg.representation_dim = 33
    cfg.num_levels = 512
    cfg.prior_cache_dtype = "int8"
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))

    @jax.jit
    def draw(key, b):
        s = prior.sample(params, key, b)
        return jnp.sum(s).astype(jnp.int32)

    for b in (256, 512, 1024, 2048):
        try:
            fn = jax.jit(lambda k, b=b: jnp.sum(prior.sample(params, k, b)).astype(jnp.int32))
            fn(jax.random.PRNGKey(0)).block_until_ready()  # compile + warm
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                fn(jax.random.PRNGKey(i + 1)).block_until_ready()
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            print(f"B={b}: {dt:.3f} s -> {b / dt:.1f} samples/s  (spread {min(ts):.3f}-{max(ts):.3f})")
        except Exception as e:  # OOM at the top end is informative, not fatal
            print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
