"""PyTorch-semantics 2-D convolution ops on NHWC layouts for TPU.

The reference model (``/root/reference/HopVAE.py:11-126``) is built from
``nn.Conv2d`` / ``nn.ConvTranspose2d`` with symmetric integer padding. TPUs
want NHWC activations and HWIO kernels so the MXU sees large contiguous
channel dims; these helpers express the exact torch arithmetic in that
layout via ``lax.conv_general_dilated`` (one XLA op each, fully fusable).

Kernel layout conventions (what the checkpoint converter must produce):

- ``conv2d``: kernel is HWIO, i.e. torch ``(O, I, kH, kW)`` transposed by
  ``(2, 3, 1, 0)``.
- ``conv_transpose2d``: kernel is HWIO *of the equivalent forward
  convolution*: torch stores ``(I, O, kH, kW)``; the equivalent forward conv
  uses the spatially-flipped kernel with in/out swapped, i.e.
  ``w.flip(2, 3).transpose to (kH, kW, I→in, O→out)`` = ``(2, 3, 0, 1)``
  after flipping the spatial axes.  Runtime is then a plain input-dilated
  convolution — no per-step flips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# f32 params must accumulate in f32: JAX's default matmul precision demotes
# to bf16 passes, which breaks checkpoint parity (~4e-3 rel err). The perf
# path opts into bf16 *explicitly* via dtype, never via implicit precision.
_PRECISION = lax.Precision.HIGHEST


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch ``nn.Conv2d(stride, padding)`` on NHWC input.

    Output spatial size: ``floor((H + 2p - k) / s) + 1`` (HopVAE encoder:
    28→14→7→8→8, matching ``representation_dim`` in the reference configs).
    """
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch ``nn.ConvTranspose2d(stride, padding)`` on NHWC input.

    Implemented as its mathematical equivalent: the input dilated by
    ``stride`` convolved (stride 1) with the flipped kernel under padding
    ``k - 1 - p``.  Output spatial size: ``(H - 1)*s - 2p + k`` (HopVAE
    decoder: 8→7→14→28).  ``kernel`` must already be in the flipped HWIO
    layout documented in the module docstring.
    """
    k = kernel.shape[0]
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
    )
    if bias is not None:
        y = y + bias
    return y


def torch_conv_kernel_to_hwio(w) -> jnp.ndarray:
    """Convert a torch Conv2d weight ``(O, I, kH, kW)`` to HWIO."""
    return jnp.asarray(w).transpose(2, 3, 1, 0)


def torch_conv_transpose_kernel_to_hwio(w) -> jnp.ndarray:
    """Convert a torch ConvTranspose2d weight ``(I, O, kH, kW)`` to the
    flipped HWIO layout consumed by :func:`conv_transpose2d`."""
    w = jnp.asarray(w)[:, :, ::-1, ::-1]
    return w.transpose(2, 3, 0, 1)
