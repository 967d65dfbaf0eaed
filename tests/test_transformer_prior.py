"""Transformer prior: causality, KV-cache exactness vs the dense forward,
sampling determinism, trainability, and HopVAE integration. Mirrors the
PixelCNN prior's test strategy (SURVEY.md §4.3) for the third prior family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.models.priors.transformer import TransformerPrior


def _tiny_prior(r=4, c=3, lvl=16):
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = r
    cfg.index_dim = c
    cfg.num_levels = lvl
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_layers = 2
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))
    return prior, params, cfg


def test_blocked_attention_matches_dense():
    """Op-level: the flash-style blocked backend must equal the dense
    masked softmax — values AND gradients — including when S does not
    divide the block sizes (padding path)."""
    from hopvae_tpu.ops.attention import blocked_causal_attention, dense_causal_attention

    rng = np.random.default_rng(0)
    for s, qb, kb in [(37, 16, 8), (48, 16, 16), (16, 64, 64), (5, 2, 3)]:
        q, k, v = (
            jnp.asarray(rng.standard_normal((2, s, 2, 8), dtype=np.float32))
            for _ in range(3)
        )
        dense = dense_causal_attention(q, k, v)
        blocked = jax.jit(
            lambda q, k, v: blocked_causal_attention(q, k, v, q_block=qb, kv_block=kb)
        )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(blocked), np.asarray(dense), rtol=1e-5, atol=1e-5,
            err_msg=f"S={s} qb={qb} kb={kb}",
        )

        w = jnp.asarray(rng.standard_normal(dense.shape, dtype=np.float32))
        gd = jax.grad(lambda q, k, v: jnp.sum(dense_causal_attention(q, k, v) * w), (0, 1, 2))(q, k, v)
        gb = jax.grad(
            lambda q, k, v: jnp.sum(
                blocked_causal_attention(q, k, v, q_block=qb, kv_block=kb) * w
            ),
            (0, 1, 2),
        )(q, k, v)
        for a, b in zip(gb, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"grad S={s} qb={qb} kb={kb}",
            )


def test_blocked_prior_forward_matches_dense():
    """Whole-prior: prior_attn=blocked reproduces the dense training
    forward's logits and parameter gradients on shared params."""
    prior_d, params, cfg = _tiny_prior()
    cfg.prior_attn = "blocked"
    cfg.prior_q_block = 16
    cfg.prior_kv_block = 8
    prior_b = TransformerPrior(cfg)
    assert prior_d.attn == "dense" and prior_b.attn == "blocked"

    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    ld = jax.jit(prior_d.forward)(params, g)
    lb = jax.jit(prior_b.forward)(params, g)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(ld), rtol=1e-4, atol=1e-5)

    def nll(prior, p):
        logp = jax.nn.log_softmax(prior.forward(p, g), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, g.astype(jnp.int32)[..., None], axis=-1))

    gd = jax.grad(lambda p: nll(prior_d, p))(params)
    gb = jax.grad(lambda p: nll(prior_b, p))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gd), jax.tree_util.tree_leaves_with_path(gb)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_attn_auto_selection():
    """auto → dense below the threshold, flash (→ blocked off-TPU) at
    the scaled grids; an explicit bad value raises."""
    cfg = load_config("pixelcnn_mnist_28")  # r=8, C=3 → S=192
    assert TransformerPrior(cfg).attn == "dense"
    cfg.representation_dim = 17  # S=867
    assert TransformerPrior(cfg).attn == "flash"
    cfg.prior_attn = "dense"
    assert TransformerPrior(cfg).attn == "dense"
    cfg.prior_attn = "bogus"
    with pytest.raises(ValueError):
        TransformerPrior(cfg)


def test_causality():
    """Logits at flat position p must not depend on grid values at >= p
    (AR order: raster over (i, j), channel chain innermost)."""
    prior, params, cfg = _tiny_prior()
    r, c = cfg.representation_dim, cfg.index_dim
    rng = np.random.default_rng(0)
    g1 = rng.integers(0, cfg.num_levels, (1, r, r, c)).astype(np.float32)
    fwd = jax.jit(prior.forward)
    base = np.asarray(fwd(params, jnp.asarray(g1))).reshape(-1, cfg.num_levels)

    for p in (0, 5, r * r * c - 1):
        g2 = g1.copy().reshape(-1)
        g2[p:] = (g2[p:] + 7) % cfg.num_levels  # perturb position p and later
        g2 = g2.reshape(1, r, r, c)
        pert = np.asarray(fwd(params, jnp.asarray(g2))).reshape(-1, cfg.num_levels)
        np.testing.assert_allclose(pert[: p + 1], base[: p + 1], rtol=1e-5, atol=1e-6)
        if p + 1 < len(base):
            assert not np.allclose(pert[p + 1 :], base[p + 1 :], rtol=1e-5, atol=1e-6)


def test_kv_cache_decode_matches_dense_forward():
    """The scan/KV-cache decode path (what sampling runs) must reproduce
    the dense causal forward's logits position-for-position."""
    prior, params, cfg = _tiny_prior()
    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    dense = jax.jit(prior.forward)(params, g)
    cached = jax.jit(prior.decode_logits)(params, g)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(dense), rtol=2e-5, atol=2e-5)


def test_sampling_determinism_and_range():
    prior, params, cfg = _tiny_prior()
    s1 = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(5)))
    s2 = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(5)))
    s3 = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(6)))
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    assert s1.shape == (3, cfg.representation_dim, cfg.representation_dim, cfg.index_dim)
    assert s1.min() >= 0 and s1.max() <= cfg.num_levels - 1


def test_bits_decrease_under_training():
    """A few Adam steps on a fixed batch must reduce the cross-entropy —
    the gradient path through the causal forward is live."""
    import optax

    prior, params, cfg = _tiny_prior()
    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.num_levels, (8, r, r, c)), jnp.float32
    )

    def loss(p):
        logits = prior.forward(p, g)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = g.astype(jnp.int32)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], axis=-1))

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(p, o):
        l, grads = jax.value_and_grad(loss)(p)
        u, o = tx.update(grads, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(30):
        params, opt, l = step(params, opt)
    assert float(l) < l0 * 0.9


def test_hopvae_integration_prior_phase():
    """prior=Transformer wires through the model's fit_prior loss and the
    sample() generation path end-to-end."""
    from hopvae_tpu.models.hopvae import HopVAE

    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 8
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_layers = 2
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 28, 28, 1), dtype=np.float32)
    )
    xr, aux = jax.jit(lambda p, x: model.forward(p, x, fit_prior=True))(params, x)
    assert xr.shape == x.shape and np.isfinite(float(aux))
    s = model.sample(params, jax.random.PRNGKey(1), num_samples=2)
    assert s.shape == (2, 28, 28, 1) and bool(jnp.all(jnp.isfinite(s)))


@pytest.mark.parametrize("kv_heads", [1, 2])
def test_gqa_cache_decode_matches_forward(kv_heads):
    """Grouped-query / multi-query attention (prior_kv_heads < heads):
    the KV-cached decode path must still reproduce the batched causal
    forward position-for-position, for both attention backends."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 4
    cfg.index_dim = 3
    cfg.num_levels = 16
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 4
    cfg.prior_layers = 2
    cfg.prior_kv_heads = kv_heads
    prior = TransformerPrior(cfg)
    params = prior.init(jax.random.PRNGKey(0))
    dh = cfg.prior_d_model // cfg.prior_heads
    assert params["blocks"][0]["qkv"]["kernel"].shape == (
        32, 32 + 2 * kv_heads * dh,
    )

    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    dense = jax.jit(prior.forward)(params, g)
    cached = jax.jit(prior.decode_logits)(params, g)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(dense), rtol=2e-5, atol=2e-5)

    # blocked backend agrees with dense on the grouped-broadcast K/V
    cfg.prior_attn = "blocked"
    cfg.prior_q_block = 16
    cfg.prior_kv_block = 8
    blocked = jax.jit(TransformerPrior(cfg).forward)(params, g)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense), rtol=1e-4, atol=1e-5)

    # sampling runs with the shrunken caches and stays in range
    s = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(5)))
    assert s.shape == (3, r, r, c) and s.min() >= 0 and s.max() <= cfg.num_levels - 1


def test_gqa_validation():
    cfg = load_config("pixelcnn_mnist_28")
    cfg.prior_heads = 4
    cfg.prior_kv_heads = 3  # does not divide
    with pytest.raises(ValueError):
        TransformerPrior(cfg)


def test_numpy_params_after_msgpack_roundtrip():
    """Native-checkpoint loads hand back numpy leaves; the embedding
    gathers must not choke on numpy-indexed-by-tracer (regression: the
    shipped Transformer-MNIST-28.msgpack failed to sample)."""
    from flax import serialization

    prior, params, cfg = _tiny_prior()
    np_params = serialization.from_bytes(
        jax.device_get(params), serialization.to_bytes(jax.device_get(params))
    )
    assert isinstance(np_params["tok_emb"], np.ndarray)
    s = jax.jit(lambda k: prior.sample(np_params, k, 2))(jax.random.PRNGKey(0))
    ref = jax.jit(lambda k: prior.sample(params, k, 2))(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref))
    np.testing.assert_allclose(
        np.asarray(prior.forward(np_params, ref)),
        np.asarray(prior.forward(params, ref)),
        rtol=1e-6,
    )


def test_flash_backend_matches_dense_and_auto_selects_it():
    """prior_attn=flash must agree with the dense forward (off-TPU it
    falls back to the blocked math — same tolerances), and "auto" must
    select it at S >= 512 so the TPU production path is the default."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 4
    cfg.index_dim = 3
    cfg.num_levels = 16
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 4
    cfg.prior_layers = 2
    dense_prior = TransformerPrior(cfg)
    assert dense_prior.attn == "dense"  # small S: auto stays dense
    params = dense_prior.init(jax.random.PRNGKey(0))
    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    dense = jax.jit(dense_prior.forward)(params, g)

    cfg.prior_attn = "flash"
    flash = jax.jit(TransformerPrior(cfg).forward)(params, g)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), rtol=1e-4, atol=1e-5)

    # gradients flow through the (fallback) flash path
    loss = lambda p: jnp.sum(TransformerPrior(cfg).forward(p, g) ** 2)
    grads = jax.grad(loss)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(grads)
    )

    big = load_config("ffhq_64_scaled")
    big.prior = "Transformer"
    assert TransformerPrior(big).attn == "flash"  # auto at S = 867


def test_auto_avoids_flash_for_unsupported_head_dims():
    """The Mosaic kernel rejects head dims > 128 that aren't 128-multiples
    (NotImplementedError at trace time on TPU) — auto must route those to
    the blocked backend instead of crashing on hardware (review finding)."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 17  # S = 867 >= auto threshold
    cfg.prior_d_model = 768
    cfg.prior_heads = 4  # dh = 192: flash-unsupported
    assert TransformerPrior(cfg).attn == "blocked"
    cfg.prior_heads = 3  # dh = 256: 128-multiple, flash ok
    assert TransformerPrior(cfg).attn == "flash"
    cfg.prior_d_model = 128
    cfg.prior_heads = 4  # dh = 32 <= 128: flash ok
    assert TransformerPrior(cfg).attn == "flash"


@pytest.mark.parametrize("kv_heads", [2, 1])
def test_int8_kv_cache_decode(kv_heads):
    """prior_cache_dtype=int8: the quantized-cache decode must stay close
    to the f32 decode (per-token absmax int8 on K/V), and sampling must
    run with the side scale caches through the growing-segment scan."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 5
    cfg.index_dim = 3
    cfg.num_levels = 16
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_kv_heads = kv_heads
    cfg.prior_layers = 2
    cfg.prior_cache_dtype = "int8"
    cfg.prior_decode_segment = 16  # force several growing segments (S=75)
    prior = TransformerPrior(cfg)
    assert prior.cache_dtype == jnp.int8
    params = prior.init(jax.random.PRNGKey(0))
    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(11).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    exact = jax.jit(prior.forward)(params, g)
    quant = jax.jit(lambda p, g: prior.decode_logits(p, g, cache_dtype=jnp.int8))(params, g)
    # int8 per-token quantization: small relative logit error, not exact
    err = float(jnp.max(jnp.abs(quant - exact)))
    scale = float(jnp.max(jnp.abs(exact)))
    assert err < 0.05 * max(scale, 1.0), (err, scale)
    # f32 gate unchanged
    gate = jax.jit(prior.decode_logits)(params, g)
    np.testing.assert_allclose(np.asarray(gate), np.asarray(exact), rtol=2e-5, atol=2e-5)

    s = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(5)))
    assert s.shape == (3, r, r, c) and s.min() >= 0 and s.max() <= cfg.num_levels - 1


def test_int4_kv_cache_decode():
    """prior_cache_dtype=int4 (native XLA S4 storage, per-(token, kv-head)
    absmax to ±7): decode must stay within the coarser 4-bit error band of
    the f32 decode, and sampling must run end-to-end."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.representation_dim = 5
    cfg.index_dim = 3
    cfg.num_levels = 16
    cfg.prior = "Transformer"
    cfg.prior_d_model = 32
    cfg.prior_heads = 2
    cfg.prior_layers = 2
    cfg.prior_cache_dtype = "int4"
    cfg.prior_decode_segment = 16  # force several growing segments (S=75)
    prior = TransformerPrior(cfg)
    assert prior.cache_dtype == jnp.int4
    params = prior.init(jax.random.PRNGKey(0))
    r, c = cfg.representation_dim, cfg.index_dim
    g = jnp.asarray(
        np.random.default_rng(11).integers(0, cfg.num_levels, (2, r, r, c)), jnp.float32
    )
    exact = jax.jit(prior.forward)(params, g)
    quant = jax.jit(lambda p, g: prior.decode_logits(p, g, cache_dtype=jnp.int4))(params, g)
    # 15-level quantization: ~16x int8's error band
    err = float(jnp.max(jnp.abs(quant - exact)))
    scale = float(jnp.max(jnp.abs(exact)))
    assert err < 0.5 * max(scale, 1.0), (err, scale)

    s = np.asarray(jax.jit(lambda k: prior.sample(params, k, 3))(jax.random.PRNGKey(5)))
    assert s.shape == (3, r, r, c) and s.min() >= 0 and s.max() <= cfg.num_levels - 1


def test_cache_dtype_validation():
    """Unknown prior_cache_dtype strings must raise, not silently fall
    back to f32 (review finding — a typo'd "i8" would double the cache
    bytes while the user believes int8 is active)."""
    cfg = load_config("pixelcnn_mnist_28")
    cfg.prior_cache_dtype = "i8"
    with pytest.raises(ValueError, match="prior_cache_dtype"):
        TransformerPrior(cfg)


def test_cache_dtype_auto_default():
    """round-4 decision: auto cache dtype = int8 once S >= 512 (measured
    1.43-1.51x decode at zero teacher-forced bits drift on the trained
    checkpoints, BASELINE.md), bfloat16 below; explicit settings win."""
    cfg = load_config("pixelcnn_mnist_28")  # r=8, S=192
    assert TransformerPrior(cfg).cache_dtype == jnp.bfloat16
    cfg17 = load_config("pixelcnn_mnist_28")
    cfg17.representation_dim = 17  # S=867
    assert TransformerPrior(cfg17).cache_dtype == jnp.int8
    cfg17.prior_cache_dtype = "bfloat16"
    assert TransformerPrior(cfg17).cache_dtype == jnp.bfloat16
