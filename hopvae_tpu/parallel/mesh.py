"""Device mesh + sharding rules — the TPU-native parallelism layer.

The reference is single-process single-device (``main.py:96-97``; SURVEY.md
§2 "Parallelism: NONE"), so this subsystem is new, designed per the north
star: data parallelism over ICI via a ``jax.sharding.Mesh``, with the
Hopfield pattern memory replicated at 512 patterns or sharded over the
``model`` axis for the scaled 4096-pattern config. XLA inserts the
gradient ``psum``s from the shardings — no hand-written collectives in the
train step.

Axes:
- ``data``  — batch dimension; gradients all-reduce over ICI.
- ``model`` — optional; shards each Hopfield ``lookup_weights`` (M, d) and
  its value projection over the pattern axis M. Attention over patterns is
  a *reduction* over M: on the XLA impl the partial softmax stats become an
  ICI all-reduce inserted from the shardings; on the Pallas impl the
  kernel's flash stats are log-sum-exp-merged across shards explicitly
  (``ops/hopfield_pallas.hopfield_bottleneck_pallas_sharded``).

Everything degrades transparently to a 1-chip mesh (identity shardings).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. Defaults to all local devices on the
    data axis — a no-op mesh on a single chip."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over ``data``, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def _is_pattern_leaf(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    return "lookup_weights" in keys


def param_shardings(mesh: Mesh, params, *, shard_patterns: bool = False):
    """Sharding pytree for params: replicated, except (optionally) the
    Hopfield pattern memories sharded over ``model`` on the M axis.

    ``shard_patterns`` is worthwhile only for scaled memories (the
    ffhq_64_scaled 4096-pattern config); at M=512 replication is faster
    than the extra collective.
    """
    replicated = NamedSharding(mesh, P())
    pattern = NamedSharding(mesh, P("model", None))

    def _one(path, leaf):
        if shard_patterns and _is_pattern_leaf(path) and leaf.ndim == 2:
            return pattern
        return replicated

    return jax.tree_util.tree_map_with_path(_one, params)


def shard_params(mesh: Mesh, params, *, shard_patterns: bool = False):
    """Place params on the mesh according to :func:`param_shardings`."""
    return jax.device_put(params, param_shardings(mesh, params, shard_patterns=shard_patterns))


def process_batch_bounds(mesh: Mesh, global_batch: int) -> tuple[int, int]:
    """Half-open ``[start, stop)`` of the global batch this process must
    provide under :func:`batch_sharding`.

    The batch axis is sharded over ``data`` in device order, so each
    process's addressable portion is one contiguous run — this is what
    lets every host read and decode ONLY its own slice of an FFHQ batch
    instead of materializing the identical global batch everywhere
    (each file is opened by exactly one process)."""
    im = batch_sharding(mesh).addressable_devices_indices_map((global_batch,))
    starts, stops = [], []
    for (sl,) in im.values():
        starts.append(0 if sl.start is None else sl.start)
        stops.append(global_batch if sl.stop is None else sl.stop)
    lo, hi = min(starts), max(stops)
    # contiguity sanity: the union of addressable slices must be one run
    span = sorted((0 if s.start is None else s.start,
                   global_batch if s.stop is None else s.stop)
                  for (s,) in im.values())
    cover = span[0][0]
    for a, b in span:
        assert a <= cover, f"non-contiguous process batch slices: {span}"
        cover = max(cover, b)
    return lo, hi


def shard_batch(mesh: Mesh, batch, *, global_batch: int | None = None):
    """Place a host batch onto the mesh, sharded over ``data``.

    Two multi-process modes (``HOPVAE_MULTIHOST=1`` slices; a plain
    ``device_put`` cannot target non-addressable shards):

    - ``global_batch=None``: every process holds the same full global
      batch (same data + seed on each host); each contributes its
      addressable slices via ``make_array_from_callback``.
    - ``global_batch=N``: ``batch`` holds only this process's
      ``process_batch_bounds(mesh, N)`` slice — the scalable input path —
      and the global array is assembled zero-copy from per-process local
      data via ``make_array_from_process_local_data``.

    Single-process keeps the direct put in both modes."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        if global_batch is not None:
            def put_local(x):
                x = np.asarray(x)
                return jax.make_array_from_process_local_data(
                    sh, x, (global_batch,) + x.shape[1:]
                )

            return jax.tree_util.tree_map(put_local, batch)

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
