"""Conv/ConvTranspose torch-semantics parity (SURVEY.md §7 step 2).

torch's conv kernels are the numeric ground truth (the reference model and
its checkpoint were trained through them); these tests pin the NHWC/HWIO
reformulation in hopvae_tpu.ops.conv to that behavior for every geometry
the HopVAE encoder/decoder uses (k4s2p1, k4s1p2, k3s1p1, 1×1, and the
three transposed-conv shapes).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from hopvae_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    torch_conv_kernel_to_hwio,
    torch_conv_transpose_kernel_to_hwio,
)

CONV_CASES = [
    # (in_ch, out_ch, k, stride, pad, H)
    (1, 32, 4, 2, 1, 28),
    (32, 64, 4, 2, 1, 14),
    (64, 64, 4, 1, 2, 7),
    (64, 64, 3, 1, 1, 8),
    (64, 64, 1, 1, 0, 8),
    (3, 128, 4, 2, 1, 64),
]

TRANSPOSE_CASES = [
    (64, 32, 4, 1, 2, 8),
    (32, 32, 4, 2, 1, 7),
    (32, 1, 4, 2, 1, 14),
    (128, 64, 4, 1, 2, 17),
]


@pytest.mark.parametrize("in_ch,out_ch,k,s,p,h", CONV_CASES)
def test_conv2d_matches_torch(in_ch, out_ch, k, s, p, h):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, in_ch, h, h), dtype=np.float32)
    w = rng.standard_normal((out_ch, in_ch, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(out_ch, dtype=np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p)
    got = conv2d(
        jnp.asarray(x).transpose(0, 2, 3, 1),
        torch_conv_kernel_to_hwio(w),
        jnp.asarray(b),
        stride=s,
        padding=p,
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_ch,out_ch,k,s,p,h", TRANSPOSE_CASES)
def test_conv_transpose2d_matches_torch(in_ch, out_ch, k, s, p, h):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, in_ch, h, h), dtype=np.float32)
    w = rng.standard_normal((in_ch, out_ch, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(out_ch, dtype=np.float32)

    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p)
    got = conv_transpose2d(
        jnp.asarray(x).transpose(0, 2, 3, 1),
        torch_conv_transpose_kernel_to_hwio(w),
        jnp.asarray(b),
        stride=s,
        padding=p,
    ).transpose(0, 3, 1, 2)
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_encoder_decoder_spatial_inverse():
    """Encoder spatial map H→H/4+1 and decoder inverse, per config geometry
    (SURVEY.md §2.3/§2.4): 28→8→28, 32→9→32, 64→17→64, 128→33→128."""
    for h, rep in [(28, 8), (32, 9), (64, 17), (128, 33)]:
        e = h
        for k, s, p in [(4, 2, 1), (4, 2, 1), (4, 1, 2), (3, 1, 1)]:
            e = (e + 2 * p - k) // s + 1
        assert e == rep, (h, e, rep)
        d = rep
        for k, s, p in [(4, 1, 2), (4, 2, 1), (4, 2, 1)]:
            d = (d - 1) * s - 2 * p + k
        assert d == h, (rep, d, h)
