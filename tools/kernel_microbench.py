"""Bottleneck-kernel micro-benchmark: device time for the streaming Pallas
forward and backward at several memory sizes, on the local TPU.

Used to make kernel-level decisions falsifiable (module docstring of
``ops/hopfield_pallas.py`` cites numbers measured with this script — e.g.
the split-vs-fused backward dead end and the bf16-table non-win).

Note on interpretation: ``fwd_step`` chains only the first lookup's output
(``e``), so XLA dead-code-eliminates lookups 2/3 — the "fwd" number is the
d64→d64 lookup alone, not the full bottleneck. ``fwd+bwd`` differentiates
the full bottleneck loss, so all three lookups' forward+backward run.

Run: ``python tools/kernel_microbench.py`` (~2 min warm cache).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hopvae_tpu.ops import hopfield_pallas as hp
from hopvae_tpu.ops.hopfield import init_hopfield_params
from hopvae_tpu.utils.benchmark import device_seconds_per_iter

N_TOK = 256 * 289  # ffhq-64 production shape: batch 256, r=17
D, DI = 64, 3


def make_params(m: int) -> dict:
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "hopfield": init_hopfield_params(ks[0], D, D, m),
        "embedding_to_index": init_hopfield_params(ks[1], D, DI, m),
        "index_to_embedding": init_hopfield_params(ks[2], DI, D, m),
    }


def main() -> None:
    for m in (512, 2048, 4096, 16384):
        params = make_params(m)
        x = jax.random.normal(jax.random.PRNGKey(1), (N_TOK, D), jnp.float32)

        def fwd_step(s, params=params):
            e, _, _ = hp.hopfield_bottleneck_pallas(params, s, 512)
            return e

        def bwd_step(s, params=params):
            def loss(p, t):
                e, zq, r = hp.hopfield_bottleneck_pallas(p, t, 512)
                return jnp.mean((r - e) ** 2) + jnp.mean(e)

            return jax.grad(loss, argnums=1)(params, s)

        dtf = device_seconds_per_iter(fwd_step, x, iters=10)
        dtb = device_seconds_per_iter(bwd_step, x, iters=10)
        fl1 = 2 * N_TOK * m * (D + D)  # lookup-1 attention matmuls
        print(
            f"M={m:6d}: lookup-1 fwd {dtf * 1e3:7.3f} ms ({fl1 / dtf / 1e12:5.1f} TF/s), "
            f"full fwd+bwd {dtb * 1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
