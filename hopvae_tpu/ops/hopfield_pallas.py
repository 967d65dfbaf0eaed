"""Fused Pallas TPU kernel for the triple-Hopfield bottleneck.

Replaces three separate attention-over-memory ops + elementwise glue
(``HopVAE.py:255-272``) with ONE kernel pass per token block: every
intermediate (retrieval, index logits, sigmoid, straight-through round,
round-trip readout) stays in VMEM — zero HBM round-trips between stages.

Math per layer (derived in ops/hopfield.py): with K = LN(patterns) and
U = (LN(patterns) @ W_in + b_in) @ W_out *pre-folded on the host side*
(attention rows sum to 1, so the out-projection and both biases fold into
the value table and a constant shift):

    out = softmax(β · LN(x) Kᵀ) @ U + b_out,   β = 1/√d_in

Two kernels share the folded-table math:

- ``_bottleneck_fwd_pallas`` — single-shot: all three K/U tables resident
  in VMEM next to a token block, one grid axis over tokens. Kept as the
  reference implementation.
- ``_bottleneck_fwd_streaming`` — flash-style online-softmax over
  (tokens × M-blocks). **This is the production path at every memory
  size** (M=512: 1.9×, M=4096: 2.9× over single-shot; 3-5× over XLA):
  the 2D grid lets Mosaic double-buffer pattern-table loads against
  compute, and it is the only path that fits M ≳ 8192 at all
  (M=16384 runs in 1.4 ms where single-shot exceeds VMEM).

Differentiation: each streaming lookup is a ``custom_vjp`` over its actual
array inputs ``(x, K, U, ln_scale, ln_bias)`` — the host-side table fold
stays ordinary differentiable JAX, so parameter gradients flow through it
for free. The forward kernel emits flash-style softmax row stats
(max + denominator); two backward kernels recompute the attention
probabilities blockwise from those stats, so the (N, M) attention matrix
never touches HBM in either direction — the reason this path beats XLA
autodiff (which materializes softmax outputs as residuals) for training.

Token blocking (swept 1× v5e, 2026-08-16): the INFERENCE forward picks its
token block adaptively (``_fwd_token_block_for``) — at M=512 growing the
block 256→1024 roughly halves the lookup time (per-grid-step overhead
dominates small-memory tiles; +12% end-to-end recon). Inside a
differentiated graph the VJP forward pins ``TOKEN_BLOCK`` instead: its
padding then matches the backward kernels, and the oversized block
measured ~6% slower end-to-end there (extra pad/slice traffic against
the 256-blocked backward).

Measured dead end (1× v5e, 2026-08-16): fusing the two backward kernels
into one pass — whether with VMEM-resident full dK/dU accumulators
(token-major grid) or with per-pattern-block dq partials reduced in XLA
(pattern-major grid) — is SLOWER at every M (e.g. lookup-1 fwd+bwd at
M=4096: 10.9 ms split vs 13-14.5 ms fused) despite doing 5 big matmuls
instead of 7. The split kernels pipeline better, and the backward is
partly VPU-bound (exp + the dsc elementwise chain over (256, M-block)
tiles), so saving matmul recomputes doesn't pay. Don't re-attempt without
a scheduling-level reason.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hopvae_tpu.ops.hopfield import LN_EPS
from hopvae_tpu.ops.ste import straight_through_round

TOKEN_BLOCK = 256


def _fold_layer(p):
    """Host-side constant folding of one lookup layer -> (K, U, b, ln_s, ln_b).

    K: normalized stored patterns (keys). U: value table with in- and
    out-projections folded in. b: output shift. ln_*: state-pattern norm.
    """
    patterns = p["lookup_weights"]
    mean = jnp.mean(patterns, axis=-1, keepdims=True)
    var = jnp.var(patterns, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    normed = (patterns - mean) * inv
    hi = jax.lax.Precision.HIGHEST  # folding must not introduce bf16 error
    k = normed * p["norm_stored"]["scale"] + p["norm_stored"]["bias"]
    v = normed * p["norm_proj"]["scale"] + p["norm_proj"]["bias"]
    v = jnp.dot(v, p["in_proj"]["kernel"], precision=hi) + p["in_proj"]["bias"]
    u = jnp.dot(v, p["out_proj"]["kernel"], precision=hi)
    return (
        k,
        u,
        p["out_proj"]["bias"],
        p["norm_state"]["scale"],
        p["norm_state"]["bias"],
    )


def _ln(x, scale, bias, d: int):
    """LayerNorm over the (unpadded) last-axis width ``d``."""
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / d
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _attend(q, k, u, b, beta, precision):
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * beta
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.dot(a, u, preferred_element_type=jnp.float32, precision=precision) + b


def _kernel(
    x_ref,
    k1, u1, b1, s1, t1,
    k2, u2, b2, s2, t2,
    k3, u3, b3, s3, t3,
    e_out, zq_out, r_out,
    *, num_levels: int, d: int, di: int, precision,
):
    x = x_ref[...]
    q1 = _ln(x, s1[...], t1[...], d)
    e = _attend(q1, k1[...], u1[...], b1[...], 1.0 / (d**0.5), precision)
    e_out[...] = e

    q2 = _ln(e, s2[...], t2[...], d)
    logits = _attend(q2, k2[...], u2[...], b2[...], 1.0 / (d**0.5), precision)
    idx = jax.nn.sigmoid(logits)
    zq = jnp.round(idx * (num_levels - 1))
    zq_out[...] = zq

    zn = zq / (num_levels - 1)
    q3 = _ln(zn, s3[...], t3[...], di)
    r_out[...] = _attend(q3, k3[...], u3[...], b3[...], 1.0 / (di**0.5), precision)


def _bottleneck_fwd_pallas(params: dict, x: jax.Array, num_levels: int, precision=None):
    *lead, d = x.shape
    n = 1
    for s in lead:
        n *= s
    xt = x.reshape(n, d)
    pad = (-n) % TOKEN_BLOCK
    if pad:
        xt = jnp.pad(xt, ((0, pad), (0, 0)))
    n_pad = xt.shape[0]

    l1 = _fold_layer(params["hopfield"])
    l2 = _fold_layer(params["embedding_to_index"])
    l3 = _fold_layer(params["index_to_embedding"])
    di = params["index_to_embedding"]["lookup_weights"].shape[-1]

    def vec_spec(width):
        # broadcast constants: one block covering the whole array
        return pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def mat_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    m = l1[0].shape[0]
    in_specs = [
        pl.BlockSpec((TOKEN_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    operands = [xt]
    for (k, u, b, s, t), (dk, du) in zip((l1, l2, l3), ((d, d), (d, di), (di, d))):
        in_specs += [
            mat_spec(m, dk), mat_spec(m, du),
            vec_spec(du), vec_spec(dk), vec_spec(dk),
        ]
        operands += [k, u, b[None, :], s[None, :], t[None, :]]

    out_shape = [
        jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        jax.ShapeDtypeStruct((n_pad, di), x.dtype),
        jax.ShapeDtypeStruct((n_pad, d), x.dtype),
    ]
    out_specs = [
        pl.BlockSpec((TOKEN_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TOKEN_BLOCK, di), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TOKEN_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]

    e, zq, r = pl.pallas_call(
        functools.partial(_kernel, num_levels=num_levels, d=d, di=di, precision=precision),
        grid=(n_pad // TOKEN_BLOCK,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m * (d + d + di + 2 * d),
            bytes_accessed=4 * (n_pad * d * 3 + 3 * m * d),
            transcendentals=n_pad * (2 * m + di),
        ),
    )(*operands)

    unpad = lambda a: a[:n] if pad else a
    return (
        unpad(e).reshape(*lead, d),
        unpad(zq).reshape(*lead, di),
        unpad(r).reshape(*lead, d),
    )


# ------------------------------------------------------------------------
# Flash-style pattern-axis streaming (SURVEY.md §5.7): each lookup streams
# over M-blocks of the (folded) pattern tables with an online-softmax
# accumulator — the "long-context" axis of this workload is the pattern
# memory, not the token sequence. Fastest path at every M (see module
# docstring) and the only one that scales past VMEM residency.

PATTERN_BLOCK = 2048


def _pattern_block_for(m: int) -> int:
    # block sized to the memory: small memories take one tight block
    # instead of padding up to the full PATTERN_BLOCK (4x waste at M=512)
    return min(PATTERN_BLOCK, -(-m // 256) * 256)


def _fwd_token_block_for(n: int, pattern_block: int) -> int:
    """Token block for the FORWARD streaming kernel only.

    At small memories the per-grid-step overhead dominates (M=512:
    289 steps of (256,64)@(64,512) measure 0.50 ms where 73 steps of
    (1024,64)@(64,512) measure 0.26 ms — swept on 1× v5e, 2026-08-16), so
    grow the block while (a) the (TB, PB) f32 scores tile stays within a
    2 MB budget — at PB=2048 (M ≥ 2048) this keeps TB=256, where measured
    differences were inside run-to-run noise, and stays far from the
    scoped-VMEM OOM hit at 1024×2048 — and (b) doubling doesn't inflate
    the padded total beyond 1.25× the real token count (serving batch-2 is
    578 tokens — padding to 1024 would near-double its work), unless the
    padded total doesn't grow at all (289 tokens pad to 512 either way —
    one 512-step beats two 256-steps). The two backward kernels keep
    TOKEN_BLOCK: their per-step work is ~3× the forward's, and TB=256
    measured fastest (M=512) or noise-equal (M=4096)."""
    padded = lambda b: -(-n // b) * b
    tb = TOKEN_BLOCK
    while (
        tb < 1024
        and tb * 2 * pattern_block * 4 <= (2 << 20)
        and padded(tb * 2) <= max(n + n // 4, padded(tb))
    ):
        tb *= 2
    return tb


def _ln_parts(x, d: int):
    """LayerNorm pieces over the (unpadded) last-axis width ``d``."""
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    cent = x - mean
    var = jnp.sum(cent * cent, axis=-1, keepdims=True) / d
    inv = jax.lax.rsqrt(var + LN_EPS)
    return cent * inv, inv


def _stream_fwd_kernel(
    x_ref, k_ref, u_ref, s_ref, t_ref,
    o_ref, m_out, l_out,
    acc, mx, dn,
    *, d, beta, precision, m_actual,
):
    j = pl.program_id(1)
    nm = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        mx[...] = jnp.full_like(mx, -1e30)
        dn[...] = jnp.zeros_like(dn)
        acc[...] = jnp.zeros_like(acc)

    xhat, _ = _ln_parts(x_ref[...], d)
    q = xhat * s_ref[...] + t_ref[...]
    # tables may be stored bf16 (halves their HBM traffic); casting the
    # other operand to the table dtype costs nothing beyond what the MXU's
    # default-precision bf16 passes already do
    s = jax.lax.dot_general(
        q.astype(k_ref.dtype), k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * beta
    # mask out zero-padded pattern rows in the final block
    blk = k_ref.shape[0]
    pat_idx = j * blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(pat_idx < m_actual, s, -1e30)
    m_new = jnp.maximum(mx[...], jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    scale = jnp.exp(mx[...] - m_new)
    dn[...] = dn[...] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc[...] = acc[...] * scale + jnp.dot(
        p.astype(u_ref.dtype), u_ref[...],
        preferred_element_type=jnp.float32, precision=precision,
    )
    mx[...] = m_new

    @pl.when(j == nm - 1)
    def _():
        o_ref[...] = (acc[...] / dn[...]).astype(o_ref.dtype)
        m_out[...] = mx[...]
        l_out[...] = dn[...]


def _recompute_attn(x, k, s, t, m_stat, l_stat, j, *, d, beta, precision, m_actual):
    """Rebuild one (token-block × pattern-block) tile of the attention
    probabilities from the saved flash stats (exact, not approximate)."""
    xhat, inv = _ln_parts(x, d)
    q = xhat * s + t
    sc = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * beta
    blk = k.shape[0]
    pat_idx = j * blk + jax.lax.broadcasted_iota(jnp.int32, sc.shape, dimension=1)
    sc = jnp.where(pat_idx < m_actual, sc, -1e30)
    a = jnp.exp(sc - m_stat) / l_stat
    return a, q, xhat, inv


def _stream_bwd_dx_kernel(
    x_ref, k_ref, u_ref, s_ref, t_ref, g_ref, m_ref, l_ref, delta_ref,
    dx_ref, ds_ref, dt_ref,
    dq_acc,
    *, d, beta, precision, m_actual,
):
    """Grid (token-blocks i, pattern-blocks j): accumulate dq over j; at the
    row end run the LayerNorm backward in-kernel → dx, and fold this token
    block's contribution into the (1, d) ds/dt accumulators."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nm = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dt_ref[...] = jnp.zeros_like(dt_ref)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    a, _, xhat, inv = _recompute_attn(
        x_ref[...], k_ref[...], s_ref[...], t_ref[...], m_ref[...], l_ref[...],
        j, d=d, beta=beta, precision=precision, m_actual=m_actual,
    )
    g = g_ref[...]
    da = jax.lax.dot_general(
        g.astype(u_ref.dtype), u_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dsc = a * (da - delta_ref[...]) * beta
    dq_acc[...] += jnp.dot(
        dsc.astype(k_ref.dtype), k_ref[...],
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(j == nm - 1)
    def _():
        dq = dq_acc[...]
        ds_ref[...] += jnp.sum(dq * xhat, axis=0, keepdims=True)
        dt_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        dxhat = dq * s_ref[...]
        m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / d
        m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / d
        dx_ref[...] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _stream_bwd_dku_kernel(
    x_ref, k_ref, u_ref, s_ref, t_ref, g_ref, m_ref, l_ref, delta_ref,
    dk_ref, du_ref,
    *, d, beta, precision, m_actual,
):
    """Grid (pattern-blocks j, token-blocks i): accumulate dK/dU for one
    pattern block across all token blocks (out blocks stay VMEM-resident
    for the whole inner sweep)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        du_ref[...] = jnp.zeros_like(du_ref)

    j = pl.program_id(0)
    a, q, _, _ = _recompute_attn(
        x_ref[...], k_ref[...], s_ref[...], t_ref[...], m_ref[...], l_ref[...],
        j, d=d, beta=beta, precision=precision, m_actual=m_actual,
    )
    g = g_ref[...]
    du_ref[...] += jax.lax.dot_general(
        a, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    da = jax.lax.dot_general(
        g.astype(u_ref.dtype), u_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dsc = a * (da - delta_ref[...]) * beta
    dk_ref[...] += jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _pad_tokens(arr, n: int, value: float = 0.0, block: int = None):
    pad = (-n) % (block or TOKEN_BLOCK)
    if not pad:
        return arr
    return jnp.pad(arr, ((0, pad), (0, 0)), constant_values=value)


def _attn_call_fwd(x2, k, u, s, t, precision, token_block=None):
    """pallas_call plumbing for the forward: returns (out, m_stat, l_stat),
    all sliced back to the unpadded token count.

    ``token_block=None`` picks the adaptive (inference) block; the VJP
    forward pins ``TOKEN_BLOCK`` so its padding matches the backward
    kernels — an oversized fwd block inside a differentiated graph
    measured ~6% slower end-to-end (extra pad/slice traffic between the
    fwd outputs/residuals and the 256-blocked backward)."""
    n, d = x2.shape
    m, d_out = k.shape[0], u.shape[1]
    pattern_block = _pattern_block_for(m)
    if token_block is None:
        token_block = _fwd_token_block_for(n, pattern_block)
    xt = _pad_tokens(x2, n, block=token_block)
    n_pad = xt.shape[0]
    m_pad = (-m) % pattern_block
    if m_pad:
        k = jnp.pad(k, ((0, m_pad), (0, 0)))
        u = jnp.pad(u, ((0, m_pad), (0, 0)))
    n_m = (m + m_pad) // pattern_block

    out, m_stat, l_stat = pl.pallas_call(
        functools.partial(
            _stream_fwd_kernel, d=d, beta=1.0 / (d**0.5),
            precision=precision, m_actual=m,
        ),
        grid=(n_pad // token_block, n_m),
        in_specs=[
            pl.BlockSpec((token_block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pattern_block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pattern_block, d_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((token_block, d_out), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((token_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((token_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_out), x2.dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((token_block, d_out), jnp.float32),
            pltpu.VMEM((token_block, 1), jnp.float32),
            pltpu.VMEM((token_block, 1), jnp.float32),
        ],
    )(xt, k, u, s[None, :], t[None, :])

    if n_pad != n:
        out, m_stat, l_stat = out[:n], m_stat[:n], l_stat[:n]
    return out, m_stat, l_stat


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_ln_stream(x2, k, u, s, t, precision):
    """Differentiable streaming lookup core: ``softmax(β·LN(x)Kᵀ) @ U`` for
    2D ``x2 (N, d_in)`` (state LayerNorm fused in-kernel; bias added by the
    caller). Backward is two fused Pallas kernels (module docstring)."""
    out, _, _ = _attn_call_fwd(x2, k, u, s, t, precision)
    return out


def _attn_ln_stream_fwd(x2, k, u, s, t, precision):
    out, m_stat, l_stat = _attn_call_fwd(
        x2, k, u, s, t, precision, token_block=TOKEN_BLOCK
    )
    return out, (x2, k, u, s, t, m_stat, l_stat, out)


def _attn_ln_stream_bwd(precision, res, g):
    x2, k, u, s, t, m_stat, l_stat, out = res
    n, d = x2.shape
    m, d_out = k.shape[0], u.shape[1]
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out.astype(jnp.float32), axis=-1, keepdims=True)

    xt = _pad_tokens(x2, n)
    gt = _pad_tokens(g, n)
    # padded token rows must recompute to a == 0 exactly: exp(sc - 1e30)/1
    mt = _pad_tokens(m_stat, n, value=1e30)
    lt = _pad_tokens(l_stat, n, value=1.0)
    dt_ = _pad_tokens(delta, n)
    n_pad = xt.shape[0]

    pattern_block = _pattern_block_for(m)
    m_pad = (-m) % pattern_block
    kp, up = k, u
    if m_pad:
        kp = jnp.pad(k, ((0, m_pad), (0, 0)))
        up = jnp.pad(u, ((0, m_pad), (0, 0)))
    n_m = (m + m_pad) // pattern_block
    n_i = n_pad // TOKEN_BLOCK

    kern = functools.partial(
        _stream_bwd_dx_kernel, d=d, beta=1.0 / (d**0.5),
        precision=precision, m_actual=m,
    )
    tok_spec = lambda w: pl.BlockSpec((TOKEN_BLOCK, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    pat_spec = lambda w: pl.BlockSpec((pattern_block, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    vec_spec = lambda w: pl.BlockSpec((1, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    dx, ds, dt = pl.pallas_call(
        kern,
        grid=(n_i, n_m),
        in_specs=[
            tok_spec(d), pat_spec(d), pat_spec(d_out), vec_spec(d), vec_spec(d),
            tok_spec(d_out), tok_spec(1), tok_spec(1), tok_spec(1),
        ],
        out_specs=[tok_spec(d), vec_spec(d), vec_spec(d)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TOKEN_BLOCK, d), jnp.float32)],
    )(xt, kp, up, s[None, :], t[None, :], gt, mt, lt, dt_)

    kern2 = functools.partial(
        _stream_bwd_dku_kernel, d=d, beta=1.0 / (d**0.5),
        precision=precision, m_actual=m,
    )
    # Measured dead end (2026-08-17): giving this kernel its own bigger
    # token block (256→1024 at M=512) wins in isolation (0.45→0.27 ms
    # per lookup, chained microbench) but LOSES ~15% end-to-end train
    # throughput (33k→27.7k img/s, 3 interleaved reps) — the separately-
    # padded second input set defeats sharing with the dx kernel's
    # operands and the larger tiles crowd the backward's VMEM pipeline.
    # Both backward kernels stay on TOKEN_BLOCK with shared operands.
    # grid transposed: (pattern-blocks outer, token-blocks inner)
    tok_spec2 = lambda w: pl.BlockSpec((TOKEN_BLOCK, w), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    pat_spec2 = lambda w: pl.BlockSpec((pattern_block, w), lambda j, i: (j, 0), memory_space=pltpu.VMEM)
    vec_spec2 = lambda w: pl.BlockSpec((1, w), lambda j, i: (0, 0), memory_space=pltpu.VMEM)

    dk, du = pl.pallas_call(
        kern2,
        grid=(n_m, n_i),
        in_specs=[
            tok_spec2(d), pat_spec2(d), pat_spec2(d_out), vec_spec2(d), vec_spec2(d),
            tok_spec2(d_out), tok_spec2(1), tok_spec2(1), tok_spec2(1),
        ],
        out_specs=[pat_spec2(d), pat_spec2(d_out)],
        out_shape=[
            jax.ShapeDtypeStruct((m + m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((m + m_pad, d_out), jnp.float32),
        ],
    )(xt, kp, up, s[None, :], t[None, :], gt, mt, lt, dt_)

    if n_pad != n:
        dx = dx[:n]
    if m_pad:
        dk, du = dk[:m], du[:m]
    return (
        dx,
        dk.astype(k.dtype),
        du.astype(u.dtype),
        ds[0].astype(s.dtype),
        dt[0].astype(t.dtype),
    )


_attn_ln_stream.defvjp(_attn_ln_stream_fwd, _attn_ln_stream_bwd)


def _lookup_streaming(folded, x: jax.Array, *, precision=None, table_dtype=None) -> jax.Array:
    """One Hopfield lookup with the pattern axis streamed in blocks.

    ``folded`` = (K, U, b, ln_scale, ln_bias) from :func:`_fold_layer`;
    ``x`` is (..., d_in); returns (..., d_out). Fully differentiable
    (custom-VJP Pallas backward).

    ``table_dtype=jnp.bfloat16`` stores the folded K/U tables in bf16
    (halving their HBM bytes); accumulation stays f32 and gradients flow
    back through the casts to the f32 master parameters. Measured on
    1× v5e (2026-08-16): NO speedup at M=512 or 4096 — Mosaic's grid
    pipelining already hides the table DMAs behind compute — and the
    quantizer's bin flips amplify the bf16 rounding into the round-trip
    output. Kept as an option for genuinely bandwidth-bound future shapes
    (M ≳ 10⁵); default off.
    """
    k, u, b, s, t = folded
    if table_dtype is not None:
        k = k.astype(table_dtype)
        u = u.astype(table_dtype)
    d_out = u.shape[1]
    *lead, d = x.shape
    x2 = x.reshape(-1, d)
    out = _attn_ln_stream(x2, k, u, s, t, precision)
    return (out + b).reshape(*lead, d_out)


def hopfield_lookup_pallas(params: dict, x: jax.Array, *, precision=None) -> jax.Array:
    """Single Hopfield lookup via the streaming kernel — the Pallas
    counterpart of ``ops.hopfield.hopfield_lookup`` (same params pytree,
    same semantics, differentiable)."""
    return _lookup_streaming(_fold_layer(params), x, precision=precision)


def _bottleneck_fwd_streaming(
    params: dict, x: jax.Array, num_levels: int, precision=None, table_dtype=None
):
    """Per-stage streaming bottleneck — the production Pallas path (fastest
    at every memory size; see module docstring). Differentiable end-to-end:
    the table folds are plain JAX, the lookups carry Pallas VJPs, and the
    quantizer uses the same straight-through round as the XLA impl
    (``/root/reference/utils/__init__.py:51-55`` semantics).

    ``precision=None`` (default) lets the MXU use fast bf16 passes — the
    production choice; pass ``jax.lax.Precision.HIGHEST`` for f32-exact
    parity checks."""
    l1 = _fold_layer(params["hopfield"])
    l2 = _fold_layer(params["embedding_to_index"])
    l3 = _fold_layer(params["index_to_embedding"])
    kw = dict(precision=precision, table_dtype=table_dtype)
    e = _lookup_streaming(l1, x, **kw)
    idx = jax.nn.sigmoid(_lookup_streaming(l2, e, **kw))
    zq = straight_through_round(idx * (num_levels - 1))
    zn = zq / (num_levels - 1)
    # layer 3's pattern dim is index_dim (tiny) but its memory is still M
    r = _lookup_streaming(l3, zn, **kw)
    return e, zq, r


def hopfield_bottleneck_pallas(
    params: dict, x: jax.Array, num_levels: int, precision=None, table_dtype=None
):
    # Streaming wins at EVERY memory size measured (M=512: 1.9x, M=4096:
    # 2.9x over the single-shot fused kernel; 3-5x over XLA) — the 2D
    # (tokens, M-blocks) grid double-buffers pattern-table loads against
    # compute, and it is the only path that fits M > ~8192 in VMEM at all.
    # The single-shot kernel is kept as a reference implementation.
    return _bottleneck_fwd_streaming(
        params, x, num_levels, precision=precision, table_dtype=table_dtype
    )


# ------------------------------------------------------------------------
# Multi-device dispatch. XLA's partitioner cannot split a Pallas custom
# call on its own, so under plain ``jit`` with a sharded batch the kernel
# would force a full all-gather; instead the bottleneck runs per-device
# via ``shard_map``:
#
# - data axis: batch sharded; the shard_map transpose inserts the
#   parameter-gradient psum over ICI automatically.
# - model axis (``shard_patterns=True``): each device holds an M/n_model
#   slice of every pattern memory. The forward kernel already emits
#   flash-style (row-max, denominator) stats, so the cross-shard softmax
#   is a log-sum-exp merge: gm = pmax(m), gl = psum(l·exp(m−gm)),
#   out = psum(o·l·exp(m−gm))/gl. The backward reuses the SAME local
#   kernels with the GLOBAL stats — exp(sc − gm)/gl is exactly the global
#   attention restricted to the local shard — and every cross-shard
#   reduction the gradients need (dx/ds/dt over model, everything over
#   data) is linear, so the shard_map transpose's automatic psums finish
#   the job. No hand-written collectives in the backward at all.


def _attn_tp_merge(x2, k, u, s, t, precision, axis_name, token_block=None):
    o_s, m_s, l_s = _attn_call_fwd(x2, k, u, s, t, precision, token_block=token_block)
    gm = jax.lax.pmax(m_s, axis_name)
    w = l_s * jnp.exp(m_s - gm)
    gl = jax.lax.psum(w, axis_name)
    out = jax.lax.psum(o_s.astype(jnp.float32) * w, axis_name) / gl
    return out.astype(o_s.dtype), gm, gl


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_ln_stream_tp(x2, k, u, s, t, precision, axis_name):
    """Pattern-sharded streaming lookup: call INSIDE shard_map with ``k``/
    ``u`` holding this device's pattern slice; returns the exact global
    attention output (log-sum-exp merge over ``axis_name``)."""
    out, _, _ = _attn_tp_merge(x2, k, u, s, t, precision, axis_name)
    return out


def _attn_ln_stream_tp_fwd(x2, k, u, s, t, precision, axis_name):
    # pin TOKEN_BLOCK like the single-device VJP forward: the backward
    # kernels are 256-blocked, and an oversized fwd block inside a
    # differentiated graph measured slower (module docstring)
    out, gm, gl = _attn_tp_merge(
        x2, k, u, s, t, precision, axis_name, token_block=TOKEN_BLOCK
    )
    return out, (x2, k, u, s, t, gm, gl, out)


def _attn_ln_stream_tp_bwd(precision, axis_name, res, g):
    # The primal output is model-replicated, so shard_map's transpose
    # delivers each shard only its FRACTION of the output cotangent;
    # without collectives of our own, dk/du (model-sharded, no transpose
    # psum) would come out 1/n_model of the truth. Reassemble the full
    # cotangent first; then the local backward driven by the GLOBAL stats
    # is exact: dk/du are complete per shard, and dx/ds/dt per-shard
    # contributions (linear in the local dq) are summed by the transpose's
    # automatic model-axis psums.
    g = jax.lax.psum(g, axis_name)
    return _attn_ln_stream_bwd(precision, res, g)


_attn_ln_stream_tp.defvjp(_attn_ln_stream_tp_fwd, _attn_ln_stream_tp_bwd)


def _bottleneck_tp_local(params, x, num_levels, axis_name, precision=None):
    """Per-device bottleneck over pattern-sharded memories (inside
    shard_map). Same composition as :func:`_bottleneck_fwd_streaming`, with
    the TP lookup doing the cross-shard softmax merge."""
    def lk(folded, inp):
        k, u, b, s, t = folded
        *lead, d = inp.shape
        out = _attn_ln_stream_tp(inp.reshape(-1, d), k, u, s, t, precision, axis_name)
        return (out + b).reshape(*lead, u.shape[1])

    l1 = _fold_layer(params["hopfield"])
    l2 = _fold_layer(params["embedding_to_index"])
    l3 = _fold_layer(params["index_to_embedding"])
    e = lk(l1, x)
    idx = jax.nn.sigmoid(lk(l2, e))
    zq = straight_through_round(idx * (num_levels - 1))
    zn = zq / (num_levels - 1)
    r = lk(l3, zn)
    return e, zq, r


def hopfield_bottleneck_pallas_sharded(
    params: dict,
    x: jax.Array,
    num_levels: int,
    mesh,
    *,
    shard_patterns: bool = False,
    precision=None,
):
    """Multi-device bottleneck: batch over ``data``, and (optionally) the
    pattern memories over ``model`` — see the dispatch comment above."""
    from jax.sharding import PartitionSpec as P

    def leaf_spec(path, _leaf):
        keys = [getattr(q, "key", getattr(q, "idx", None)) for q in path]
        if shard_patterns and "lookup_weights" in keys:
            return P("model", None)
        return P()

    pspec = jax.tree_util.tree_map_with_path(leaf_spec, params)

    if shard_patterns:
        def fn(p, t):
            return _bottleneck_tp_local(p, t, num_levels, "model", precision=precision)
    else:
        def fn(p, t):
            return hopfield_bottleneck_pallas(p, t, num_levels, precision=precision)

    # shard_map needs the batch divisible by the data axis; eval sweeps hit
    # partial final batches, so pad up and slice back (the pad's VJP is a
    # slice — gradients unaffected)
    n = x.shape[0]
    n_data = mesh.shape["data"]
    pad = (-n) % n_data
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    out = jax.shard_map(
        fn, mesh=mesh, in_specs=(pspec, P("data")), out_specs=P("data"), check_vma=False
    )(params, x)
    if pad:
        out = tuple(a[:n] for a in out)
    return out
