"""Analytic FLOPs model + MFU accounting for HopVAE (SURVEY.md §6).

The reference publishes no utilization numbers; this module makes every
perf claim falsifiable: images/sec alone says nothing about whether a
stage is compute- or bandwidth-bound, MFU does.

Conventions:
- one multiply-add = 2 FLOPs;
- conv FLOPs = 2 · H_out·W_out · C_in·C_out · kh·kw per image;
- transposed conv counted input-based (each input pixel touches the full
  kernel): 2 · H_in·W_in · C_in·C_out · kh·kw — identical total to the
  gradient-of-conv view;
- a training step ≈ 3× forward (forward + input-grad + weight-grad
  matmuls/convs all have the same contraction sizes);
- elementwise/LN/softmax work is ignored (<1% of the matmul FLOPs here).

Chip peaks (TPU v5e / "v5 lite", per chip): 197 TFLOP/s bf16 MXU,
819 GB/s HBM. f32 matmuls on this MXU run as multi-pass bf16; MFU is
reported against the bf16 peak for production (bf16/default-precision)
paths — the honest denominator, since that is the silicon's ceiling.
"""

from __future__ import annotations

PEAK_BF16_FLOPS = 197e12  # TPU v5e per-chip MXU peak, bf16
PEAK_HBM_BYTES = 819e9  # TPU v5e per-chip HBM bandwidth


def conv2d_flops(h_out: int, w_out: int, c_in: int, c_out: int, k: int) -> int:
    return 2 * h_out * w_out * c_in * c_out * k * k


def encoder_flops(cfg) -> int:
    """4 convs (k4s2p1, k4s2p1, k4s1p2, k3s1p1) + residual stack; geometry
    H → H/2 → H/4 → H/4+1 → H/4+1 (``/root/reference/HopVAE.py:42-83``)."""
    h, c = cfg.num_hiddens, cfg.num_channels
    s0 = cfg.image_size
    s1, s2 = s0 // 2, s0 // 4
    r = s2 + 1
    total = conv2d_flops(s1, s1, c, h // 2, 4)
    total += conv2d_flops(s2, s2, h // 2, h, 4)
    total += conv2d_flops(r, r, h, h, 4)
    total += conv2d_flops(r, r, h, h, 3)
    total += residual_stack_flops(cfg, r)
    return total


def residual_stack_flops(cfg, r: int) -> int:
    res = cfg.num_residual_hiddens
    h = cfg.num_hiddens
    per_block = conv2d_flops(r, r, h, res, 3) + conv2d_flops(r, r, res, h, 1)
    return cfg.num_residual_layers * per_block


def decoder_flops(cfg) -> int:
    """3×3 conv + residual stack + 3 transposed convs
    (``/root/reference/HopVAE.py:86-126``)."""
    h, c, d = cfg.num_hiddens, cfg.num_channels, cfg.embedding_dim
    r = cfg.representation_dim
    s2, s1 = cfg.image_size // 4, cfg.image_size // 2
    total = conv2d_flops(r, r, d, h, 3)
    total += residual_stack_flops(cfg, r)
    total += conv2d_flops(r, r, h, h // 2, 4)  # trans_1 (input-based), r→s2
    total += conv2d_flops(s2, s2, h // 2, h // 2, 4)  # trans_2, s2→s1
    total += conv2d_flops(s1, s1, h // 2, c, 4)  # trans_3, s1→image
    return total


def bottleneck_flops(cfg) -> int:
    """Triple Hopfield lookup: per lookup 2·r²·M·(d_in + d_out) attention
    matmuls + the (token-independent) value-table fold
    2·M·(d_in² + d_in·d_out) amortized per image at batch≥1 (counted per
    image here — negligible at production batch)."""
    r2 = cfg.representation_dim**2
    m, d, di = cfg.num_embeddings, cfg.embedding_dim, cfg.index_dim
    attn = 2 * r2 * m * ((d + d) + (d + di) + (di + d))
    return attn + 2 * cfg.embedding_dim * m  # pre_vq handled in conv count


def pre_vq_flops(cfg) -> int:
    r = cfg.representation_dim
    return conv2d_flops(r, r, cfg.num_hiddens, cfg.embedding_dim, 1)


def forward_flops_per_image(cfg) -> int:
    return encoder_flops(cfg) + pre_vq_flops(cfg) + bottleneck_flops(cfg) + decoder_flops(cfg)


def train_flops_per_image(cfg) -> int:
    return 3 * forward_flops_per_image(cfg)


def mfu(flops_per_item: float, items_per_sec: float, peak: float = PEAK_BF16_FLOPS) -> float:
    return flops_per_item * items_per_sec / peak


def bottleneck_hbm_bytes_per_image(cfg, *, table_dtype_bytes: int = 4) -> int:
    """Streaming-kernel HBM traffic model: pattern tables (K + folded U per
    lookup) are re-fetched once per token block; token activations move
    once each way per lookup. Used for roofline classification."""
    from hopvae_tpu.ops.hopfield_pallas import TOKEN_BLOCK

    r2 = cfg.representation_dim**2
    m, d, di = cfg.num_embeddings, cfg.embedding_dim, cfg.index_dim
    widths = [(d, d), (d, di), (di, d)]
    table_bytes = sum(m * (i + o) * table_dtype_bytes for i, o in widths)
    token_bytes = sum((i + o) * 4 * r2 for i, o in widths)
    # per image: tables amortize over TOKEN_BLOCK tokens of the batch
    return table_bytes * r2 // TOKEN_BLOCK + token_bytes
