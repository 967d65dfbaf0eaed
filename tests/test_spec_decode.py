"""Speculative self-drafting decode (models/priors/spec_decode.py):
the chunked verify must equal the training forward teacher-forced
(deterministic gate), and the sampler's output distribution must match
the direct KV-cached sampler's (statistical gate — speculative sampling
is exact by construction, so disagreement means a bug, not noise)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.models.priors.spec_decode import (
    _chunk_forward,
    _empty_ring,
    sample_speculative,
)
from hopvae_tpu.models.priors.transformer import TransformerPrior


def _tiny_prior(kv_heads=2, cache_dtype="float32", r=2, levels=7):
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = r
    cfg.index_dim = 3
    cfg.num_levels = levels
    cfg.prior = "Transformer"
    cfg.prior_d_model = 16
    cfg.prior_heads = 2
    cfg.prior_kv_heads = kv_heads
    cfg.prior_layers = 2
    cfg.prior_attn = "dense"
    cfg.prior_cache_dtype = cache_dtype
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))
    return cfg, prior, params


@pytest.mark.parametrize("kv_heads", [2, 1])
def test_chunk_forward_matches_training_forward(kv_heads):
    """Teacher-forcing the verify chunk over sequential windows must
    reproduce forward()'s logits exactly (same math, different
    factorization) — the deterministic correctness gate for the full-
    cache verify path including its per-row scatter writes."""
    cfg, prior, params = _tiny_prior(kv_heads=kv_heads)
    b, s, k = 3, prior.seq, 5
    rng = np.random.default_rng(0)
    grid = jnp.asarray(
        rng.integers(0, cfg.num_levels, (b, cfg.representation_dim,
                                         cfg.representation_dim, cfg.index_dim)),
        jnp.float32,
    )
    ref = jax.jit(prior.forward)(params, grid).reshape(b, s, cfg.num_levels)

    tokens = grid.astype(jnp.int32).reshape(b, s)
    caches = _empty_ring(prior, b, s, prior.cache_dtype)
    got = []
    t = 0
    pars = jax.tree_util.tree_map(jnp.asarray, params)
    while t < s:
        c = min(k + 1, s - t)
        pos = jnp.broadcast_to(jnp.arange(t, t + c), (b, c))
        prev = jnp.concatenate(
            [
                (tokens[:, t - 1 : t] if t else jnp.zeros((b, 1), jnp.int32)),
                tokens[:, t : t + c - 1],
            ],
            axis=1,
        )
        caches, lp, _ = _chunk_forward(
            prior, pars, caches, prev, pos, jnp.ones((b, c), bool)
        )
        got.append(lp)
        t += c
    got = jnp.concatenate(got, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
def test_speculative_shapes_determinism_and_range(cache_dtype):
    cfg, prior, params = _tiny_prior(cache_dtype=cache_dtype)
    r, c = cfg.representation_dim, cfg.index_dim
    fn = jax.jit(
        lambda p, key: sample_speculative(prior, p, key, 4, k=3, window=4)
    )
    s1 = np.asarray(fn(params, jax.random.PRNGKey(7)))
    s2 = np.asarray(fn(params, jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(s1, s2)
    assert s1.shape == (4, r, r, c)
    assert s1.min() >= 0 and s1.max() <= cfg.num_levels - 1
    # window larger than the sequence and k=1 both degrade gracefully
    s3 = np.asarray(
        jax.jit(lambda p, key: sample_speculative(prior, p, key, 2, k=1, window=64))(
            params, jax.random.PRNGKey(3)
        )
    )
    assert s3.shape == (2, r, r, c)


def test_speculative_matches_direct_distribution():
    """Speculative sampling is EXACT: per-position marginals over many
    draws must match the direct sampler's within sampling noise. A
    masking/acceptance bug shifts these far beyond the tolerance."""
    cfg, prior, params = _tiny_prior(levels=5)
    n = 4000
    s = prior.seq
    direct = np.asarray(
        jax.jit(lambda p, key: prior.sample(p, key, n))(params, jax.random.PRNGKey(11))
    ).reshape(n, s)
    spec = np.asarray(
        jax.jit(
            lambda p, key: sample_speculative(prior, p, key, n, k=4, window=5)
        )(params, jax.random.PRNGKey(12))
    ).reshape(n, s)

    # per-position total variation between empirical marginals
    worst = 0.0
    for pos in range(s):
        fd = np.bincount(direct[:, pos].astype(int), minlength=cfg.num_levels) / n
        fs = np.bincount(spec[:, pos].astype(int), minlength=cfg.num_levels) / n
        worst = max(worst, 0.5 * np.abs(fd - fs).sum())
    # TV of two n=4000 empirical distributions of the same law is
    # ~sqrt(L/n) ≈ 0.035; 0.08 gives ~2.3x headroom without masking bugs
    assert worst < 0.08, f"worst per-position marginal TV {worst}"

    # pairwise joint over the first two positions (catches acceptance
    # bugs that preserve marginals but break conditionals)
    joint_d = np.zeros((cfg.num_levels,) * 2)
    joint_s = np.zeros((cfg.num_levels,) * 2)
    for a, bb in direct[:, :2].astype(int):
        joint_d[a, bb] += 1
    for a, bb in spec[:, :2].astype(int):
        joint_s[a, bb] += 1
    tv = 0.5 * np.abs(joint_d / n - joint_s / n).sum()
    assert tv < 0.12, f"first-two-position joint TV {tv}"


def test_sample_dispatches_to_speculative():
    """prior_spec_k > 0 routes TransformerPrior.sample through the
    speculative decoder (same shapes/range contract)."""
    cfg, prior, params = _tiny_prior()
    cfg.prior_spec_k = 3
    cfg.prior_spec_window = 4
    sp = TransformerPrior(cfg)
    out = np.asarray(
        jax.jit(lambda p, key: sp.sample(p, key, 3))(params, jax.random.PRNGKey(0))
    )
    assert out.shape == (3, cfg.representation_dim, cfg.representation_dim, cfg.index_dim)
    assert out.min() >= 0 and out.max() <= cfg.num_levels - 1
