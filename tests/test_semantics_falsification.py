"""Hopfield-semantics falsification tests (VERDICT r4 weak #4).

The hflayers semantics in ``ops/hopfield.py`` are a *derivation* (the
upstream package is absent here), and the torch mirror used by the parity
tests encodes the same derivation — mirror-parity alone cannot catch a
shared misreading. The independent anchor is the TRAINED reference
checkpoint: its golden statistics (recon-MSE 0.00734, embedding round-trip
loss 3.7e-5 on rendered digits) only hold if the lookup math matches what
the weights were trained under (``/root/reference/HopVAE.py:149-170`` via
hflayers defaults, SURVEY.md §2.6a).

This file turns that argument into a test: each plausible mis-derivation
of the semantics — the specific choices the derivation had to make — is
applied to the converted checkpoint, and the golden statistics must
degrade by the large measured margins (≥10× on the round-trip loss for
every fork; 5.7×-170× on recon MSE). If some perturbation left the
goldens intact, the checkpoint would not pin that choice and the parity
suite would be advertising more than it proves.

Perturbations falsified here (each a real fork in the derivation):

- ``beta_1``        — softmax scale β=1 instead of 1/√d_in (hflayers'
                      ``scaling`` default for a single head).
- ``swap_norms``    — ``norm_stored_pattern`` applied to the value path
                      and ``norm_pattern_projection`` to the keys (which
                      LayerNorm wraps what).
- ``proj_q``        — the surviving in-projection applied to the QUERIES
                      instead of the values (with static state/stored
                      patterns, exactly one of the three MHA in-proj
                      slices survives; the derivation says it is V's).
- ``no_state_norm`` — queries not LayerNormed (``normalize_state_pattern``
                      actually defaulting to False would look like this).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hopvae_tpu.config import load_config
from hopvae_tpu.data import render_digits
from hopvae_tpu.models.hopvae import HopVAE
from hopvae_tpu.ops.hopfield import layer_norm
from hopvae_tpu.ops.ste import straight_through_round
from hopvae_tpu.utils.checkpoint import load_reference_checkpoint

CKPT = "/root/reference/checkpoints/MNIST-28.ckpt"
# (mode, min recon-MSE degrade ×, min round-trip degrade ×). Thresholds are
# ~half the degradation measured on the converted checkpoint (2026-08-19,
# 64 rendered digits): beta_1 116×/978×, swap_norms 5.7×/15.7×, proj_q
# 170×/120×, no_state_norm 66×/409×. swap_norms is the weakest fork — the
# trained stored/value LayerNorms are the closest pair — but the trained
# attractor consistency still breaks it by an order of magnitude.
PERTURBATIONS = (
    ("beta_1", 50.0, 100.0),
    ("swap_norms", 3.0, 10.0),
    ("proj_q", 50.0, 50.0),
    ("no_state_norm", 30.0, 100.0),
)


def perturbed_lookup(params, x, mode: str) -> jax.Array:
    """``ops.hopfield.hopfield_lookup`` with one derivation choice flipped.

    ``mode=None`` reproduces the production math exactly (sanity-checked
    against the real implementation below).
    """
    patterns = params["lookup_weights"]
    d_in = patterns.shape[-1]

    k_norm, v_norm = params["norm_stored"], params["norm_proj"]
    if mode == "swap_norms":
        k_norm, v_norm = v_norm, k_norm

    k = layer_norm(patterns, k_norm["scale"], k_norm["bias"])
    if mode == "no_state_norm":
        q = x
    else:
        q = layer_norm(x, params["norm_state"]["scale"], params["norm_state"]["bias"])
    v = layer_norm(patterns, v_norm["scale"], v_norm["bias"])

    if mode == "proj_q":
        q = jnp.dot(q, params["in_proj"]["kernel"]) + params["in_proj"]["bias"]
    else:
        v = jnp.dot(v, params["in_proj"]["kernel"]) + params["in_proj"]["bias"]

    beta = 1.0 if mode == "beta_1" else 1.0 / np.sqrt(d_in)
    scores = jnp.einsum("...sd,md->...sm", q, k) * beta
    attn = jax.nn.softmax(scores, axis=-1)
    readout = jnp.einsum("...sm,md->...sd", attn, v)
    return jnp.dot(readout, params["out_proj"]["kernel"]) + params["out_proj"]["bias"]


def forward_stats(model, params, x, mode):
    """(recon_mse, roundtrip_loss) of the reference forward pipeline
    (HopVAE.py:248-293) with every bottleneck lookup running ``mode``."""
    z = model._encode_to_tokens(params, x)
    e = perturbed_lookup(params["hopfield"], z, mode)
    i = jax.nn.sigmoid(perturbed_lookup(params["embedding_to_index"], e, mode))
    zq = straight_through_round(i * (model.num_levels - 1))
    r = perturbed_lookup(params["index_to_embedding"], zq / (model.num_levels - 1), mode)
    x_recon = model._tokens_to_image(params, e)
    return float(jnp.mean((x_recon - x) ** 2)), float(jnp.mean((r - e) ** 2))


@pytest.fixture(scope="module")
def golden():
    cfg = load_config("mnist_28")
    model = HopVAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = load_reference_checkpoint(model, params, CKPT)
    digits, _ = render_digits(64, 28, seed=0)
    x = jnp.asarray((digits.astype(np.float32) / 255.0 - 0.1307) / 0.3081)[..., None]
    return cfg, model, params, x


def test_unperturbed_pipeline_matches_model(golden):
    """mode=None is the production math — pins that the perturbation
    harness itself is faithful, so the failures below mean what they say."""
    cfg, model, params, x = golden
    mse, aux = forward_stats(model, params, x, None)
    x_recon, model_aux = model.forward(params, x)
    np.testing.assert_allclose(mse, float(jnp.mean((x_recon - x) ** 2)), rtol=1e-5)
    np.testing.assert_allclose(aux, float(model_aux), rtol=1e-4)
    # and the goldens themselves hold (same anchor bench gates on-device)
    assert mse < 0.02, mse
    assert aux < 5e-4, aux


@pytest.mark.parametrize("mode,mse_factor,aux_factor", PERTURBATIONS)
def test_misderivation_breaks_golden_stats(golden, mode, mse_factor, aux_factor):
    cfg, model, params, x = golden
    base_mse, base_aux = forward_stats(model, params, x, None)
    mse, aux = forward_stats(model, params, x, mode)
    # the trained checkpoint must pin EACH disputed choice: a flipped
    # derivation has to destroy reconstruction quality AND the trained
    # attractor (round-trip) consistency by the measured margins above
    assert mse > mse_factor * base_mse, (
        f"{mode}: recon MSE {mse} vs golden {base_mse} — checkpoint does "
        f"not pin this semantics choice"
    )
    assert aux > aux_factor * base_aux, (
        f"{mode}: round-trip loss {aux} vs golden {base_aux} — checkpoint "
        f"does not pin this semantics choice"
    )
