"""On-device timing harness.

This machine reaches its TPU through a tunneled PJRT backend with ~35 ms
host↔device roundtrip latency and slow host transfers, and
``block_until_ready`` does not reliably block on it — naive
dispatch-loop timing over-reports throughput by orders of magnitude.

The harness therefore measures *pure device time*: ``iters`` chained
applications of the step function inside one jitted ``fori_loop`` (data
dependence prevents elision/overlap), reduced to one scalar whose host
fetch forces completion. The fixed tunnel roundtrip is cancelled by
differencing two iteration counts.

LIMIT: the step function must not itself contain a large
``lax.while_loop`` — a big while_loop body (the r=33 speculative
sampler: B=256, S=3267 caches in the carry) nested inside this harness's
``fori_loop`` reproducibly crashed the TPU worker ("kernel fault") on
first execution, while the same while_loop ran fine as a bare jitted
dispatch (measured 2026-08-18, twice). Kernels that run multiple seconds
per call don't need the chained harness anyway: time them as bare
dispatches with a scalar fetch — the ~35 ms tunnel roundtrip is < 1 %
there. Use this harness for sub-100 ms steps.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _scalar_probe(state) -> jax.Array:
    """One scalar data-dependent on EVERY leaf of the loop output.

    Must cover all leaves: probing a subset lets XLA dead-code-eliminate
    the rest of the loop body when the probed leaves are loop-invariant
    (observed: a prior-phase train step whose frozen params are add-zero
    identities timed 695k img/s — the entire step was eliminated). The
    probe runs once after the loop; its cost is negligible."""
    leaves = [l for l in jax.tree_util.tree_leaves(state) if hasattr(l, "dtype")]
    return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)


def device_seconds_per_iter(step_fn, init_state, *, iters: int = 20, repeats: int = 3) -> float:
    """Seconds per application of ``step_fn`` (state -> state) on device.

    Times one fused loop of ``iters`` and one of ``2*iters`` chained steps
    and returns the slope — constant dispatch/fetch overhead cancels.

    MEDIAN of the positive slopes across ``repeats``, not the minimum: a
    single tunnel hiccup during the short run deflates that repeat's
    slope, and a min would latch onto the glitch (observed as a 3×
    over-reported throughput once per ~dozen measurements). The median
    survives one bad repeat at ``repeats >= 3`` (the new default).
    """

    def make(n):
        @jax.jit
        def run(state):
            out = jax.lax.fori_loop(0, n, lambda i, s: step_fn(s), state)
            return _scalar_probe(out)

        return run

    run1, run2 = make(iters), make(2 * iters)
    # compile + land both
    float(run1(init_state))
    float(run2(init_state))

    slopes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1(init_state))
        t1 = time.perf_counter()
        float(run2(init_state))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / iters
        if slope > 0:
            slopes.append(slope)
    if not slopes:  # pathological timing noise; fall back to mean
        t0 = time.perf_counter()
        float(run2(init_state))
        return (time.perf_counter() - t0) / (2 * iters)
    slopes.sort()
    mid = len(slopes) // 2
    if len(slopes) % 2:
        return slopes[mid]
    # even count (a repeat was dropped as non-positive): true median —
    # the upper-middle alone would return the worse of two survivors
    return 0.5 * (slopes[mid - 1] + slopes[mid])
