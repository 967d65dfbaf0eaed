"""Fused Pallas bottleneck kernel: numerics gate vs the jnp reference
(SURVEY.md §7 step 6). Runs in interpreter mode on CPU (exact arithmetic —
interpret mode has no MXU bf16 passes, so tolerances are tight here; the
hardware bf16-MXU deviation is gated functionally in bench/verify runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hopvae_tpu.ops import bottleneck as bn
from hopvae_tpu.ops.hopfield import init_hopfield_params


def _params(m=512):
    return {
        "hopfield": init_hopfield_params(jax.random.PRNGKey(1), 64, 64, m),
        "embedding_to_index": init_hopfield_params(jax.random.PRNGKey(2), 64, 3, m),
        "index_to_embedding": init_hopfield_params(jax.random.PRNGKey(3), 3, 64, m),
    }


@pytest.mark.parametrize("m,s", [(512, 64), (128, 81)])
def test_pallas_matches_reference(m, s):
    params = _params(m)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, s, 64))
    ref = bn.hopfield_bottleneck_xla(params, x, 512)
    with pltpu.force_tpu_interpret_mode():
        got = bn.hopfield_bottleneck(params, x, 512, impl="pallas")
    for name, a, b in zip(("e", "zq", "r"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_pallas_handles_unaligned_token_count():
    """Token counts not divisible by the block size must pad+unpad cleanly."""
    params = _params(128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 37, 64))
    ref = bn.hopfield_bottleneck_xla(params, x, 512)
    with pltpu.force_tpu_interpret_mode():
        got = bn.hopfield_bottleneck(params, x, 512, impl="pallas")
    for a, b in zip(got, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_singleshot_kernel_matches_reference():
    """The single-shot fused kernel is no longer the production dispatch
    (streaming won everywhere) but is kept as a reference implementation —
    this test keeps it from rotting."""
    import hopvae_tpu.ops.hopfield_pallas as hp

    params = _params(256)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 64))
    ref = bn.hopfield_bottleneck_xla(params, x, 512)
    with pltpu.force_tpu_interpret_mode():
        got = hp._bottleneck_fwd_pallas(params, x, 512)
    for name, a, b in zip(("e", "zq", "r"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_streaming_bottleneck_matches_reference():
    """Pattern-axis streaming path (SURVEY.md §5.7): online-softmax over
    M-blocks must equal the single-shot reference, including the padded
    final block (M=3000 is not a block multiple)."""
    import hopvae_tpu.ops.hopfield_pallas as hp

    params = _params(3000)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 64))
    ref = bn.hopfield_bottleneck_xla(params, x, 512)
    with pltpu.force_tpu_interpret_mode():
        got = hp._bottleneck_fwd_streaming(params, x, 512)
    for name, a, b in zip(("e", "zq", "r"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


@pytest.mark.parametrize("m,s", [(128, 16), (600, 40)])
def test_pallas_gradients_match_reference(m, s):
    """The fused Pallas backward (flash-style stat-recompute kernels) must
    equal the jnp reference gradients for every input — x, pattern
    memories, projections, and all six LayerNorms — including STE routing
    and padded pattern blocks (M=600 is not a block multiple)."""
    params = _params(m)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, s, 64))

    def loss(impl):
        def f(p, x):
            if impl == "pallas":
                e, zq, r = bn.hopfield_bottleneck(p, x, 512, impl="pallas")
            else:
                e, zq, r = bn.hopfield_bottleneck_xla(p, x, 512)
            return jnp.mean((r - e) ** 2) + jnp.mean(e) + 1e-4 * jnp.mean(zq)

        return f

    g_ref = jax.grad(loss("xla"), argnums=(0, 1))(params, x)
    # the whole grad evaluation sits inside the interpret context: the
    # custom_vjp backward kernels are traced during the backward sweep,
    # not while the forward body runs
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss("pallas"), argnums=(0, 1))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        g_pal,
        g_ref,
    )


def test_fwd_token_block_policy():
    """The adaptive forward token block (inference-only) must respect its
    VMEM scores-tile budget, never inflate padded work beyond 1.25x the
    real token count, and still grow when padding is free."""
    from hopvae_tpu.ops.hopfield_pallas import TOKEN_BLOCK, _fwd_token_block_for

    # bench shapes: M=512 (PB=512) wants the big block
    assert _fwd_token_block_for(256 * 289, 512) == 1024
    # M>=2048 (PB=2048): scores budget pins the original block
    assert _fwd_token_block_for(256 * 289, 2048) == TOKEN_BLOCK
    # serving batch-1 (289 tokens): pads to 512 either way -> one 512 step
    assert _fwd_token_block_for(289, 512) == 512
    # batch-2 (578 tokens): growing to 512 would pad to 1024 (>1.25x) -> stay
    assert _fwd_token_block_for(578, 512) == TOKEN_BLOCK
    # just past a block boundary: must not near-double padded work
    assert _fwd_token_block_for(1030, 1024) == TOKEN_BLOCK

    for n in (1, 289, 578, 1030, 4096, 256 * 289):
        for pb in (256, 512, 1024, 2048):
            tb = _fwd_token_block_for(n, pb)
            padded = -(-n // tb) * tb
            assert tb * pb * 4 <= (2 << 20) or tb == TOKEN_BLOCK
            assert padded <= max(n + n // 4, -(-n // TOKEN_BLOCK) * TOKEN_BLOCK)
