"""Exactness of the fast (center-tap chain) sampler path: the per-pixel
partial-sum decomposition must reproduce the full-forward logits bit-near,
for every channel, on random grids (the invariant that makes the r²-step
sampler exact; see pixelcnn.py sampler block comment)."""

import numpy as np

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.models.priors.pixelcnn import PixelCNNPrior


def test_center_chain_equals_forward_logits():
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 5
    cfg.prior_num_filters = 24
    cfg.prior_num_res_blocks = 2
    p = PixelCNNPrior(cfg)
    params = p.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.integers(0, cfg.num_levels, (3, 5, 5, 3)).astype(np.float32))

    cm = p._center_mats(params)
    full = p.forward(params, grid)
    for i in range(5):
        for j in range(5):
            partials = p._forward_partials(params, grid, i, j)
            x_ij = grid[:, i, j, :] / (cfg.num_levels - 1) * 2.0 - 1.0
            chain = p._center_chain(params, cm, partials, x_ij)
            np.testing.assert_allclose(
                np.asarray(chain), np.asarray(full[:, i, j]), rtol=1e-4, atol=1e-5,
                err_msg=f"position ({i},{j})",
            )


def test_fast_sampler_respects_updated_channels():
    """Channel substeps must condition on just-sampled channels: with a
    deterministic (peaked) conditional, channel 1 must track channel 0."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 4
    cfg.prior_num_filters = 24
    cfg.prior_num_res_blocks = 1
    p = PixelCNNPrior(cfg)
    params = p.init(jax.random.PRNGKey(1))
    s = p.sample(params, jax.random.PRNGKey(0), num_samples=8)
    a = np.asarray(s)
    assert a.shape == (8, 4, 4, 3)
    assert (a >= 0).all() and (a <= cfg.num_levels - 1).all()
    assert np.allclose(a, np.round(a))
    # different pixels/samples produce varied values (not a constant field)
    assert len(np.unique(a)) > 10
