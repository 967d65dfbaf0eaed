"""Sanity of the analytic FLOPs/MFU model (utils/flops.py): geometry
consistency and order-of-magnitude checks that keep MFU claims honest."""

from hopvae_tpu.config import load_config
from hopvae_tpu.utils import flops as fl


def test_forward_flops_order_of_magnitude():
    cfg = load_config("ffhq_64")
    f = fl.forward_flops_per_image(cfg)
    # 64x64 conv stack + 289-token bottleneck: hundreds of MFLOPs/image
    assert 1e8 < f < 5e9
    assert fl.train_flops_per_image(cfg) == 3 * f


def test_flops_scale_with_config():
    small = load_config("mnist_28")
    big = load_config("ffhq_64")
    scaled = load_config("ffhq_64_scaled")
    assert fl.forward_flops_per_image(small) < fl.forward_flops_per_image(big)
    # 4096-pattern memory must dominate the 512-pattern bottleneck
    assert fl.bottleneck_flops(scaled) > 4 * fl.bottleneck_flops(big)


def test_mfu_bounded():
    cfg = load_config("ffhq_64")
    f = fl.forward_flops_per_image(cfg)
    # at the measured ~179k img/s the model must imply sub-peak utilization
    assert 0.0 < fl.mfu(f, 179_000) < 1.0
