"""Torch-primitive mirror of the HopVAE forward pass for parity testing.

This is NOT the reference code (which cannot run here — no hflayers /
torchvision): it is an independent implementation of the architecture
documented in SURVEY.md §2/§3, built directly on ``torch.nn.functional``
with the raw checkpoint tensors. Because the shipped checkpoint was
*trained* through torch's conv/conv_transpose kernels, torch is the
numeric ground truth for the conv stacks; for the Hopfield bottleneck it
cross-checks the JAX implementation's layout/transposition handling under
the same documented semantics (SURVEY.md §2.6a).

CAVEAT (circularity): for the Hopfield bottleneck this mirror encodes the
SAME derived hflayers semantics as the JAX implementation, so
bottleneck-level parity tests here are partly self-referential. The
independent anchors that would catch a shared misreading are the
*trained-checkpoint round-trip* statistics (golden recon-MSE ≈ 0.0073 and
embedding round-trip aux ≈ 3.7e-5) rather than mirror agreement — and
that anchor is now a TEST, not an argument:
``test_semantics_falsification.py`` flips each disputed derivation choice
(β=1, swapped stored/value norms, in-proj on Q, unnormed queries) and
asserts the goldens degrade by the measured 5.7×-978× margins. If a real
hflayers environment ever becomes available, pin fixed-input attention
outputs from it as extra goldens.

Layouts are torch-native NCHW here; tests convert at the boundary.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def residual_stack(sd, prefix, x, n_layers=2):
    for i in range(n_layers):
        h = F.conv2d(F.relu(x), sd[f"{prefix}._layers.{i}._block.1.weight"], padding=1)
        h = F.conv2d(F.relu(h), sd[f"{prefix}._layers.{i}._block.3.weight"])
        x = x + h
    return F.relu(x)


def encoder(sd, x):
    x = F.relu(F.conv2d(x, sd["encoder.conv_1.weight"], sd["encoder.conv_1.bias"], stride=2, padding=1))
    x = F.relu(F.conv2d(x, sd["encoder.conv_2.weight"], sd["encoder.conv_2.bias"], stride=2, padding=1))
    x = F.relu(F.conv2d(x, sd["encoder.conv_3.weight"], sd["encoder.conv_3.bias"], stride=1, padding=2))
    x = F.conv2d(x, sd["encoder.conv_4.weight"], sd["encoder.conv_4.bias"], stride=1, padding=1)
    return residual_stack(sd, "encoder.residual_stack", x)


def decoder(sd, x):
    x = F.conv2d(x, sd["decoder.conv_1.weight"], sd["decoder.conv_1.bias"], padding=1)
    x = residual_stack(sd, "decoder.residual_stack", x)
    x = F.relu(F.conv_transpose2d(x, sd["decoder.conv_trans_1.weight"], sd["decoder.conv_trans_1.bias"], stride=1, padding=2))
    x = F.relu(F.conv_transpose2d(x, sd["decoder.conv_trans_2.weight"], sd["decoder.conv_trans_2.bias"], stride=2, padding=1))
    return F.conv_transpose2d(x, sd["decoder.conv_trans_3.weight"], sd["decoder.conv_trans_3.bias"], stride=2, padding=1)


def hopfield_lookup(sd, prefix, x):
    """Static-Q/K modern-Hopfield lookup (SURVEY.md §2.6a), torch ops."""
    core = f"{prefix}.hopfield"
    patterns = sd[f"{prefix}.lookup_weights"][0]  # (M, d_in)
    d_in = patterns.shape[-1]

    k = F.layer_norm(patterns, (d_in,), sd[f"{core}.norm_stored_pattern.weight"], sd[f"{core}.norm_stored_pattern.bias"])
    q = F.layer_norm(x, (d_in,), sd[f"{core}.norm_state_pattern.weight"], sd[f"{core}.norm_state_pattern.bias"])
    v = F.layer_norm(patterns, (d_in,), sd[f"{core}.norm_pattern_projection.weight"], sd[f"{core}.norm_pattern_projection.bias"])
    v = F.linear(v, sd[f"{core}.association_core.in_proj_weight"], sd[f"{core}.association_core.in_proj_bias"])

    beta = 1.0 / math.sqrt(d_in)
    attn = torch.softmax(q @ k.T * beta, dim=-1)
    out = attn @ v
    return F.linear(out, sd[f"{core}.association_core.out_proj.weight"], sd[f"{core}.association_core.out_proj.bias"])


def forward(sd, x, num_levels=512, representation_dim=8, embedding_dim=64):
    """Full no-prior forward: returns (x_recon, embedding_recon_loss) and
    intermediates for per-stage parity checks."""
    z = encoder(sd, x)
    z = F.conv2d(z, sd["pre_vq_conv.weight"], sd["pre_vq_conv.bias"])
    b = z.shape[0]
    z = z.permute(0, 2, 3, 1).reshape(b, representation_dim**2, embedding_dim)

    z_embeddings = hopfield_lookup(sd, "hopfield", z)
    z_indices = torch.sigmoid(hopfield_lookup(sd, "embedding_to_index", z_embeddings))
    z_quant = torch.round(z_indices * (num_levels - 1))
    z_idx_norm = z_quant / (num_levels - 1)
    z_emb_recon = hopfield_lookup(sd, "index_to_embedding", z_idx_norm)
    emb_recon_loss = F.mse_loss(z_emb_recon, z_embeddings)

    grid = z_embeddings.reshape(b, representation_dim, representation_dim, embedding_dim)
    x_recon = decoder(sd, grid.permute(0, 3, 1, 2).contiguous())
    return {
        "pre_vq": z,
        "z_embeddings": z_embeddings,
        "z_indices": z_indices,
        "z_quant": z_quant,
        "x_recon": x_recon,
        "emb_recon_loss": emb_recon_loss,
    }
