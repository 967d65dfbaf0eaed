"""Encoder/decoder conv stacks — functional param-pytree modules, NHWC.

Architecture parity with ``/root/reference/HopVAE.py:11-126``:

- ``Residual``       — ReLU → 3×3 conv (no bias) → ReLU → 1×1 conv (no bias),
  additive skip (``HopVAE.py:11-26``).
- ``ResidualStack``  — N residual blocks then a final ReLU (``HopVAE.py:29-39``).
- ``Encoder``        — k4s2p1 → k4s2p1 → k4s1p2 → k3s1p1 convs with ReLUs,
  then the residual stack; spatial H → H/4 + 1 (``HopVAE.py:42-83``).
- ``Decoder``        — 3×3 conv → residual stack → transposed convs
  k4s1p2 → k4s2p1 → k4s2p1 (``HopVAE.py:86-126``), the exact inverse map.

Design is functional: each layer is ``init_*(key, ...) -> params`` plus a
pure ``*_apply(params, x)``; params are plain nested dicts/lists so the
whole model is a transparent pytree for jit/grad/shard_map and for the
torch-checkpoint converter (``utils/checkpoint.py``).

Initializers replicate torch Conv2d/ConvTranspose2d defaults
(kaiming-uniform(a=√5) ⇒ U(±1/√fan_in) for kernels, U(±1/√fan_in) for
biases) so training-from-scratch dynamics match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hopvae_tpu.ops.conv import conv2d, conv_transpose2d

relu = jax.nn.relu


def _torch_conv_init(key, kh, kw, in_ch, out_ch, use_bias=True, *, transposed=False, dtype=jnp.float32):
    """torch default init. fan_in counts ``weight.size(1) * kH * kW``:
    in_ch for Conv2d, out_ch for ConvTranspose2d."""
    k_w, k_b = jax.random.split(key)
    fan_in = (out_ch if transposed else in_ch) * kh * kw
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    p = {"kernel": jax.random.uniform(k_w, (kh, kw, in_ch, out_ch), dtype, -bound, bound)}
    if use_bias:
        p["bias"] = jax.random.uniform(k_b, (out_ch,), dtype, -bound, bound)
    return p


def init_residual(key, in_ch, num_hiddens, num_residual_hiddens, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv_a": _torch_conv_init(k1, 3, 3, in_ch, num_residual_hiddens, use_bias=False, dtype=dtype),
        "conv_b": _torch_conv_init(k2, 1, 1, num_residual_hiddens, num_hiddens, use_bias=False, dtype=dtype),
    }


def residual_apply(p, x):
    h = conv2d(relu(x), p["conv_a"]["kernel"], stride=1, padding=1)
    h = conv2d(relu(h), p["conv_b"]["kernel"], stride=1, padding=0)
    return x + h


def init_residual_stack(key, in_ch, num_hiddens, num_residual_layers, num_residual_hiddens, dtype=jnp.float32):
    keys = jax.random.split(key, num_residual_layers)
    return {
        "layers": [
            init_residual(k, in_ch, num_hiddens, num_residual_hiddens, dtype) for k in keys
        ]
    }


def residual_stack_apply(p, x):
    for layer in p["layers"]:
        x = residual_apply(layer, x)
    return relu(x)


def init_encoder(key, in_ch, num_hiddens, num_residual_layers, num_residual_hiddens, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "conv_1": _torch_conv_init(k1, 4, 4, in_ch, num_hiddens // 2, dtype=dtype),
        "conv_2": _torch_conv_init(k2, 4, 4, num_hiddens // 2, num_hiddens, dtype=dtype),
        "conv_3": _torch_conv_init(k3, 4, 4, num_hiddens, num_hiddens, dtype=dtype),
        "conv_4": _torch_conv_init(k4, 3, 3, num_hiddens, num_hiddens, dtype=dtype),
        "residual_stack": init_residual_stack(
            k5, num_hiddens, num_hiddens, num_residual_layers, num_residual_hiddens, dtype
        ),
    }


def encoder_apply(p, x):
    x = relu(conv2d(x, p["conv_1"]["kernel"], p["conv_1"]["bias"], stride=2, padding=1))
    x = relu(conv2d(x, p["conv_2"]["kernel"], p["conv_2"]["bias"], stride=2, padding=1))
    x = relu(conv2d(x, p["conv_3"]["kernel"], p["conv_3"]["bias"], stride=1, padding=2))
    x = conv2d(x, p["conv_4"]["kernel"], p["conv_4"]["bias"], stride=1, padding=1)
    return residual_stack_apply(p["residual_stack"], x)


def init_decoder(key, in_ch, out_ch, num_hiddens, num_residual_layers, num_residual_hiddens, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "conv_1": _torch_conv_init(k1, 3, 3, in_ch, num_hiddens, dtype=dtype),
        "residual_stack": init_residual_stack(
            k2, num_hiddens, num_hiddens, num_residual_layers, num_residual_hiddens, dtype
        ),
        "conv_trans_1": _torch_conv_init(k3, 4, 4, num_hiddens, num_hiddens // 2, transposed=True, dtype=dtype),
        "conv_trans_2": _torch_conv_init(k4, 4, 4, num_hiddens // 2, num_hiddens // 2, transposed=True, dtype=dtype),
        "conv_trans_3": _torch_conv_init(k5, 4, 4, num_hiddens // 2, out_ch, transposed=True, dtype=dtype),
    }


def decoder_apply(p, x):
    x = conv2d(x, p["conv_1"]["kernel"], p["conv_1"]["bias"], stride=1, padding=1)
    x = residual_stack_apply(p["residual_stack"], x)
    x = relu(conv_transpose2d(x, p["conv_trans_1"]["kernel"], p["conv_trans_1"]["bias"], stride=1, padding=2))
    x = relu(conv_transpose2d(x, p["conv_trans_2"]["kernel"], p["conv_trans_2"]["bias"], stride=2, padding=1))
    return conv_transpose2d(x, p["conv_trans_3"]["kernel"], p["conv_trans_3"]["bias"], stride=2, padding=1)
