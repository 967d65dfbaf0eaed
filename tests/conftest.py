"""Test env: CPU backend with 8 virtual devices.

Sharding tests (SURVEY.md §4.4) run the real mesh/pjit code path on fake
devices; everything else is faster on CPU than paying TPU compile latency
per test. TPU numerics are exercised by bench.py and the driver's
compile-check of __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
