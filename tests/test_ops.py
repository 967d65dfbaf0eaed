"""Ops-level property tests: STE gradient, Hopfield lookup properties,
config schema (SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hopvae_tpu.configs import available_configs, get_config
from hopvae_tpu.ops.hopfield import hopfield_lookup, init_hopfield_params
from hopvae_tpu.ops.ste import straight_through_round


def test_ste_forward_rounds():
    x = jnp.asarray([0.2, 0.5, 0.7, 1.5, 2.5, -1.2])
    got = straight_through_round(x)
    # round-half-to-even, matching torch.round
    np.testing.assert_array_equal(np.asarray(got), np.asarray([0.0, 0.0, 1.0, 2.0, 2.0, -1.0]))


def test_ste_backward_identity():
    g = jax.grad(lambda x: jnp.sum(straight_through_round(x * 3.7) ** 1.0))(jnp.arange(5.0))
    np.testing.assert_allclose(np.asarray(g), 3.7 * np.ones(5), rtol=1e-6)


def test_hopfield_lookup_shapes_and_batch_invariance():
    key = jax.random.PRNGKey(0)
    p = init_hopfield_params(key, 64, 3, 512)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    y = hopfield_lookup(p, x)
    assert y.shape == (2, 10, 3)
    # per-token op: batching must not change results
    y0 = hopfield_lookup(p, x[0])
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), rtol=1e-5, atol=1e-6)


def test_hopfield_attention_is_convex_readout():
    """With identity in/out projections and unit norms, the readout lies in
    the convex hull of the (normalized) patterns — softmax mixing."""
    d, m = 8, 16
    p = init_hopfield_params(jax.random.PRNGKey(0), d, d, m)
    p["in_proj"]["kernel"] = jnp.eye(d)
    p["in_proj"]["bias"] = jnp.zeros(d)
    p["out_proj"]["kernel"] = jnp.eye(d)
    p["out_proj"]["bias"] = jnp.zeros(d)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, d))
    y = hopfield_lookup(p, x)
    from hopvae_tpu.ops.hopfield import layer_norm

    v = layer_norm(p["lookup_weights"], p["norm_proj"]["scale"], p["norm_proj"]["bias"])
    lo, hi = np.asarray(v).min(axis=0), np.asarray(v).max(axis=0)
    assert (np.asarray(y) >= lo - 1e-5).all() and (np.asarray(y) <= hi + 1e-5).all()


REQUIRED_KEYS = {
    "batch_size", "epochs", "seed", "image_size", "learning_rate", "gamma",
    "num_hiddens", "num_residual_layers", "num_residual_hiddens",
    "embedding_dim", "num_embeddings", "num_channels", "data_set",
    "representation_dim", "num_levels", "prior_start", "prior", "index_dim",
}


@pytest.mark.parametrize("name", available_configs())
def test_config_schema_complete(name):
    cfg = get_config(name)
    missing = REQUIRED_KEYS - set(cfg)
    assert not missing, f"{name} missing {missing}"
    # geometry consistency: encoder arithmetic must land on representation_dim
    e = cfg["image_size"]
    for k, s, p in [(4, 2, 1), (4, 2, 1), (4, 1, 2), (3, 1, 1)]:
        e = (e + 2 * p - k) // s + 1
    assert e == cfg["representation_dim"]


def test_forward_rejects_nchw_with_hint():
    """Reference users migrate from torch's channels-first; a wrong layout
    must fail with an actionable message, not a cryptic conv error."""
    import pytest
    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE

    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    nchw = jnp.zeros((2, 1, 28, 28))
    with pytest.raises(ValueError, match="transpose"):
        model.forward(params, nchw)
    with pytest.raises(ValueError, match="expected NHWC"):
        model.forward(params, jnp.zeros((2, 32, 32, 1)))
