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


def test_rowcache_matches_fullgrid_sampler():
    """The row-cached sampler must draw bit-identical samples to the
    full-grid-per-pixel scan (same key ⇒ same logits ⇒ same draws), and
    its per-layer row activations must equal the full forward exactly —
    including rows 0-2, where the window overlaps the zero padding (the
    normalized-padding regression)."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 6
    cfg.prior_num_filters = 24
    cfg.prior_num_res_blocks = 2
    p = PixelCNNPrior(cfg)
    params = p.init(jax.random.PRNGKey(0))
    s_grid = p._sample_scan(params, jax.random.PRNGKey(7), 3)
    s_row = p._sample_scan_rowcache(params, jax.random.PRNGKey(7), 3)
    np.testing.assert_array_equal(np.asarray(s_grid), np.asarray(s_row))

    # activation-level exactness on a populated grid
    from hopvae_tpu.models.priors.pixelcnn import _masked_conv_apply, relu

    rng = np.random.default_rng(0)
    r, c, f = 6, 3, p.features
    grid = jnp.asarray(rng.integers(0, cfg.num_levels, (2, r, r, c)).astype(np.float32))
    x = grid / (cfg.num_levels - 1) * 2 - 1
    h_full = [_masked_conv_apply(params["conv_in"], x)]
    h = h_full[0]
    for blk in params["res"]:
        za = _masked_conv_apply(blk["conv_a"], relu(h))
        y = _masked_conv_apply(blk["conv_b"], relu(za))
        h = h + y
        h_full.append(h)

    cm = p._center_mats(params)
    grid_pad = jnp.zeros((2, r + 3, r, c)).at[:, 3:].set(grid)
    caches = tuple(jnp.zeros((2, r + 1, r, f)) for _ in range(p.n_res))
    for i in range(r):
        h_rows, _ = p._row_pass(params, cm, grid_pad, caches, i)
        for l, hr in enumerate(h_rows):
            np.testing.assert_allclose(
                np.asarray(hr), np.asarray(h_full[l][:, i]), rtol=1e-5, atol=1e-5,
                err_msg=f"row {i} layer {l}",
            )
        caches = tuple(
            jax.lax.dynamic_update_slice(cc, row[:, None], (0, i + 1, 0, 0))
            for cc, row in zip(caches, h_rows[: p.n_res])
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


def test_colchain_matches_rowcache_sampler():
    """The column-incremental sampler (production) must draw the same
    samples as the row-cache sampler — same RNG stream, logits equal to
    float-summation order — at a geometry covering multi-row windows,
    row transitions, and the 7×7 first-layer padding overlap."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 6
    cfg.prior_num_filters = 24
    cfg.prior_num_res_blocks = 2
    p = PixelCNNPrior(cfg)
    params = p.init(jax.random.PRNGKey(0))
    s_row = p._sample_scan_rowcache(params, jax.random.PRNGKey(7), 3)
    s_col = p._sample_scan_colchain(params, jax.random.PRNGKey(7), 3)
    np.testing.assert_array_equal(np.asarray(s_row), np.asarray(s_col))

    # and against the naive full-grid scan on another key
    s_grid = p._sample_scan(params, jax.random.PRNGKey(11), 2)
    s_col2 = p._sample_scan_colchain(params, jax.random.PRNGKey(11), 2)
    np.testing.assert_array_equal(np.asarray(s_grid), np.asarray(s_col2))


def test_colchain_odd_grid_matches_fullgrid():
    """Odd representation_dim (the shipped r=17/r=33 geometries are odd):
    the colchain's row-parity double buffer (round 5) must land writes and
    above-tap reads on the right planes when the final row has parity 0
    again — an even-r test cannot catch a plane swap that happens to
    realign every two rows. Small shapes keep this in the quick tier."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 5
    cfg.prior_num_filters = 12
    cfg.prior_num_res_blocks = 2
    p = PixelCNNPrior(cfg)
    params = p.init(jax.random.PRNGKey(2))
    s_grid = p._sample_scan(params, jax.random.PRNGKey(13), 2)
    s_col = p._sample_scan_colchain(params, jax.random.PRNGKey(13), 2)
    np.testing.assert_array_equal(np.asarray(s_grid), np.asarray(s_col))
