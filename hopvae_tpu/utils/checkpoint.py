"""Checkpointing: torch→JAX conversion of the shipped reference weights,
lenient pytree merge, and native msgpack save/load.

The reference ships ``checkpoints/MNIST-28.ckpt`` — a 61-tensor torch
``state_dict`` (inventory: SURVEY.md §2.7a) — and loads it leniently
(drop unknown keys, fill missing from the fresh model;
``/root/reference/utils/__init__.py:36-49``). This module provides:

- :func:`convert_torch_state_dict` — torch tensors → HopVAE param pytree
  (NCHW-OIHW → NHWC-HWIO, ConvTranspose flip+transpose, Linear ``W → Wᵀ``).
- :func:`lenient_merge` — the reference's partial-load semantics over
  pytrees (leaf adopted iff present with matching shape).
- :func:`save_params` / :func:`load_params` — framework-native msgpack
  checkpoints (via ``flax.serialization``), no torch required.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from hopvae_tpu.ops.conv import (
    torch_conv_kernel_to_hwio,
    torch_conv_transpose_kernel_to_hwio,
)

_HOPFIELD_LAYERS = ("hopfield", "embedding_to_index", "index_to_embedding")


def load_torch_state_dict(path: str) -> dict:
    """Read a torch checkpoint into a dict of numpy arrays (CPU torch only
    needed here; everything downstream is torch-free)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


def _conv(sd: Mapping[str, np.ndarray], prefix: str, *, bias: bool = True) -> dict:
    p = {"kernel": torch_conv_kernel_to_hwio(sd[f"{prefix}.weight"])}
    if bias:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _conv_t(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "kernel": torch_conv_transpose_kernel_to_hwio(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _residual_stack(sd: Mapping[str, np.ndarray], prefix: str, n_layers: int) -> dict:
    return {
        "layers": [
            {
                "conv_a": _conv(sd, f"{prefix}._layers.{i}._block.1", bias=False),
                "conv_b": _conv(sd, f"{prefix}._layers.{i}._block.3", bias=False),
            }
            for i in range(n_layers)
        ]
    }


def _hopfield(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """One hflayers HopfieldLayer → our param layout (ops/hopfield.py).

    torch Linear weights are (out, in) applied as ``x @ Wᵀ``; ours are
    (in, out) applied as ``x @ W`` — hence the transposes.
    """
    core = f"{prefix}.hopfield"
    return {
        "lookup_weights": jnp.asarray(sd[f"{prefix}.lookup_weights"][0]),
        "in_proj": {
            "kernel": jnp.asarray(sd[f"{core}.association_core.in_proj_weight"]).T,
            "bias": jnp.asarray(sd[f"{core}.association_core.in_proj_bias"]),
        },
        "out_proj": {
            "kernel": jnp.asarray(sd[f"{core}.association_core.out_proj.weight"]).T,
            "bias": jnp.asarray(sd[f"{core}.association_core.out_proj.bias"]),
        },
        "norm_stored": {
            "scale": jnp.asarray(sd[f"{core}.norm_stored_pattern.weight"]),
            "bias": jnp.asarray(sd[f"{core}.norm_stored_pattern.bias"]),
        },
        "norm_state": {
            "scale": jnp.asarray(sd[f"{core}.norm_state_pattern.weight"]),
            "bias": jnp.asarray(sd[f"{core}.norm_state_pattern.bias"]),
        },
        "norm_proj": {
            "scale": jnp.asarray(sd[f"{core}.norm_pattern_projection.weight"]),
            "bias": jnp.asarray(sd[f"{core}.norm_pattern_projection.bias"]),
        },
    }


def convert_torch_state_dict(sd: Mapping[str, np.ndarray], config) -> dict:
    """Full HopVAE state_dict → param pytree (sans prior — the reference
    MNIST-28 checkpoint carries no prior weights, SURVEY.md §2.7a)."""
    n = config.num_residual_layers
    params = {
        "encoder": {
            **{f"conv_{i}": _conv(sd, f"encoder.conv_{i}") for i in range(1, 5)},
            "residual_stack": _residual_stack(sd, "encoder.residual_stack", n),
        },
        "pre_vq_conv": _conv(sd, "pre_vq_conv"),
        **{name: _hopfield(sd, name) for name in _HOPFIELD_LAYERS},
        "post_vq_conv": _conv(sd, "post_vq_conv"),
        "decoder": {
            "conv_1": _conv(sd, "decoder.conv_1"),
            "residual_stack": _residual_stack(sd, "decoder.residual_stack", n),
            **{f"conv_trans_{i}": _conv_t(sd, f"decoder.conv_trans_{i}") for i in range(1, 4)},
        },
        "prior": {},
    }
    return params


def lenient_merge(fresh: Any, loaded: Any, _path: str = "", dropped: list | None = None) -> Any:
    """Reference partial-load semantics over pytrees: take the loaded leaf
    when present with a matching shape, else keep the fresh one
    (``utils/__init__.py:36-49``).

    ``dropped``, when given, collects the paths where the checkpoint did
    NOT land (fresh leaves kept because the loaded counterpart was absent
    or shape-mismatched, and loaded keys with no fresh counterpart) so
    callers can surface what a lenient load actually skipped."""
    if isinstance(fresh, dict):
        out = {}
        for k, v in fresh.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = lenient_merge(v, loaded[k], f"{_path}/{k}", dropped)
            else:
                out[k] = v
                if dropped is not None:
                    dropped.append(f"{_path}/{k} (not in checkpoint)")
        if dropped is not None and isinstance(loaded, dict):
            dropped.extend(
                f"{_path}/{k} (in checkpoint, no such param)"
                for k in loaded.keys() - fresh.keys()
            )
        return out
    if isinstance(fresh, (list, tuple)):
        if isinstance(loaded, (list, tuple)):
            merged = [
                lenient_merge(f, l, f"{_path}[{i}]", dropped)
                for i, (f, l) in enumerate(zip(fresh, loaded))
            ] + list(fresh[len(loaded):])
            if dropped is not None and len(fresh) > len(loaded):
                dropped.append(f"{_path}[{len(loaded)}:] (not in checkpoint)")
            if dropped is not None and len(loaded) > len(fresh):
                dropped.append(f"{_path}[{len(fresh)}:] (in checkpoint, no such param)")
            return type(fresh)(merged)
        if dropped is not None:
            dropped.append(f"{_path} (not in checkpoint)")
        return fresh
    # leaves
    if loaded is not None and getattr(loaded, "shape", None) == getattr(fresh, "shape", None):
        return jnp.asarray(loaded, dtype=fresh.dtype) if hasattr(fresh, "dtype") else loaded
    if dropped is not None:
        got = getattr(loaded, "shape", None)
        dropped.append(
            f"{_path} (shape {got} != {getattr(fresh, 'shape', None)})"
            if got is not None else f"{_path} (not in checkpoint)"
        )
    return fresh


def _warn_dropped(dropped: list, path: str) -> None:
    if not dropped:
        return
    import sys

    shown = ", ".join(dropped[:8]) + (" …" if len(dropped) > 8 else "")
    print(
        f"warning: lenient load of {path}: {len(dropped)} subtree(s) kept "
        f"their fresh initialization / were ignored: {shown}",
        file=sys.stderr,
    )


def load_reference_checkpoint(model, params: dict, ckpt_path: str) -> dict:
    """Load any checkpoint into fresh params (no-op if absent): native
    ``.msgpack`` files load directly; anything else is treated as a
    reference torch checkpoint — converted and leniently merged, mirroring
    ``load_from_checkpoint`` (``/root/reference/utils/__init__.py:36-49``)."""
    if not os.path.exists(ckpt_path):
        return params
    if ckpt_path.endswith(".msgpack"):
        return load_params_lenient(ckpt_path, params)
    sd = load_torch_state_dict(ckpt_path)
    converted = convert_torch_state_dict(sd, model.config)
    dropped: list = []
    merged = lenient_merge(params, converted, dropped=dropped)
    _warn_dropped(dropped, ckpt_path)
    return merged


# ----------------------------------------------------------- native format


def save_params(path: str, params: Any) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, like: Any) -> Any:
    """Strict structural load — raises on any pytree mismatch.  Used by
    resume (``Trainer._try_resume*``), where a silent partial restore of
    optimizer state would be a debugging trap."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


def load_params_lenient(path: str, like: Any) -> Any:
    """Native-msgpack load with the reference's partial-load semantics:
    leaves adopted where present with matching shape, fresh otherwise.

    This is what lets a checkpoint trained with one prior family seed a
    model built with another (e.g. the FFHQ-64 backbone from a PixelCNN
    run warm-starting ``--set prior=Transformer`` training): the backbone
    merges, the mismatched ``prior`` subtree stays freshly initialized —
    mirroring how the reference leniently loads its prior-less MNIST
    checkpoint (``/root/reference/utils/__init__.py:36-49``)."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    fresh_sd = serialization.to_state_dict(jax.device_get(like))
    dropped: list = []
    merged = lenient_merge(fresh_sd, raw, dropped=dropped)
    _warn_dropped(dropped, path)  # a silent partial load is a debugging trap
    return serialization.from_state_dict(like, merged)
