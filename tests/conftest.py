"""Test env: CPU backend with 8 virtual devices.

Sharding tests (SURVEY.md §4.4) run the real mesh/pjit code path on fake
devices; everything else is faster on CPU than paying TPU compile latency
per test. TPU numerics are exercised by bench.py and the driver's
compile-check of __graft_entry__.py.

Note: this machine's sitecustomize force-registers the axon TPU platform
and rewrites ``jax_platforms`` to ``axon,cpu`` — env vars alone do NOT
stick. The in-process config update below (before any backend init) is
the only reliable override; ``jax_num_cpu_devices`` supersedes the old
``--xla_force_host_platform_device_count`` XLA flag on this JAX version.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
