"""Speculative self-drafting decode for the Transformer prior.

The r=33 decode is HBM-bound on reading the K/V caches, and every byte
cut that preserves *what* is read is a measured dead end (BASELINE.md
"r=33 transformer-decode roofline": int8 is the optimum of the
read-everything design; 2× is arithmetically unreachable at int8 bytes).
This module changes what is read: the full cache is read ONCE per k+1
tokens (a chunked verify) instead of once per token, with the per-token
work done by a cheap short-window draft.

Exactness: standard speculative sampling (Leviathan et al. 2023 /
Chen et al. 2023 — rejection-sample each drafted token with probability
``min(1, p/q)``, resample the first rejection from ``max(p-q, 0)``
normalized, draw a bonus token from ``p`` when everything is accepted).
The output distribution equals the full model's regardless of draft
quality; the draft only sets the SPEED. Here the draft is the same
weights attending a sliding window of W positions — measured acceptance
(1 - TV between windowed and full conditionals, trained FFHQ-128
checkpoint, 2026-08-18): 0.84 at W=99, 0.93 at W=297, 0.96 at W=512.

TPU-first mechanics (everything device-resident inside ONE
``lax.while_loop``; static shapes throughout):

- **Per-sample positions.** Acceptance is per sample, so batch rows
  desynchronize. Each row carries its own position ``t``; cache writes
  are per-row scatters, attention masks compare against per-row ``t``.
  Synchronizing rows on the minimum acceptance would collapse E[tokens/
  round] to ~1 at batch 256.
- **Verify-only main cache.** A position's K/V encode token ``pos-1``
  (shift-right convention), so the verify chunk — which recomputes K/V
  for its k+1 positions from the accepted/drafted inputs — leaves the
  main cache correct up to the accepted point, and the rejected tail is
  overwritten by the next round before anything can read it. Draft
  steps never touch the main cache.
- **Tagged ring buffer for the draft.** The draft window [j-W, j) is a
  per-row gather if read from the main cache (slow); instead a dense
  ``(B, ring, kv, dh)`` ring holds the last W+k+1 positions with a
  position tag per slot. Draft reads the WHOLE ring (contiguous) and
  masks by tag. Ring capacity W+k+1 guarantees a draft write (position
  ≤ t+k) can only evict positions < t-W, which no future window needs.
  Stale tail entries after a rejection are masked by their tags until
  the next round's draft/verify overwrites the same slots (same
  position → same slot).

No reference counterpart (the reference has no transformer and no
serving path); prior protocol per /root/reference/utils/__init__.py:71-82.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_rows(table, idx):
    """table (N, d), idx (...,) int → (..., d)."""
    return jnp.take(table, idx, axis=0)


def _layer_mlp(p, x):
    """Post-attention half of a transformer block (matches _decode_step)."""
    from hopvae_tpu.models.priors.transformer import _ln

    z = _ln(x, p["ln2"])
    z = jax.nn.gelu(z @ p["mlp_in"]["kernel"] + p["mlp_in"]["bias"])
    return x + z @ p["mlp_out"]["kernel"] + p["mlp_out"]["bias"]


def _attend(prior, q, k_cache, v_cache, ks, vs, mask):
    """Masked attention of q (B, C, h, dh) over caches (B, L, kv, dh).

    ``ks``/``vs`` are the int8 dequantization scale caches (B, L, kv) or
    None; ``mask`` is (B, C, L) boolean. Returns (B, C, d).
    """
    b, c, h, dh = q.shape
    kv = prior.kv_heads
    g = h // kv
    qg = q.reshape(b, c, kv, g, dh)
    scores = jnp.einsum(
        "bckgd,bskd->bckgs", qg, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(float(dh))
    if ks is not None:
        scores = scores * jnp.swapaxes(ks, 1, 2)[:, None, :, None, :]  # (B,1,kv,1,S)
    scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    if vs is not None:
        att = att * jnp.swapaxes(vs, 1, 2)[:, None, :, None, :]
    out = jnp.einsum(
        "bckgs,bskd->bckgd", att.astype(q.dtype), v_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(b, c, h * dh)


def _quantize_rows(x, kv, cache_dtype):
    """(B, C, kv·dh) f32 → (codes in cache_dtype, scales (B, C, kv) or None)."""
    from hopvae_tpu.models.priors.transformer import _quantize_token

    if cache_dtype != jnp.int8:
        return x.astype(cache_dtype), None
    b, c, w = x.shape
    codes, scales = _quantize_token(x.reshape(b * c, w), kv)
    return codes.reshape(b, c, w), scales.reshape(b, c, kv)


def _chunk_forward(prior, params, caches, ids_prev, pos, write_ok):
    """Teacher-forced forward for a chunk of positions, reading + updating
    the main caches.

    ``ids_prev`` (B, C) int32: token at ``pos-1`` for each chunk position
    (the shift-right input); ``pos`` (B, C) int32 positions; ``write_ok``
    (B, C) bool — rows/positions whose K/V may land in the cache (False
    for finished rows and positions ≥ S). Returns (caches', logits
    (B, C, L)). This is the only writer of the main caches, so their
    contents are always the true model's K/V up to each row's accepted
    position (see module docstring).
    """
    from hopvae_tpu.models.priors.transformer import _ln

    b, c = ids_prev.shape
    h, dh, kv = prior.heads, prior.d // prior.heads, prior.kv_heads
    s = prior.seq
    cdt = prior.cache_dtype

    pos_c = jnp.clip(pos, 0, s - 1)
    x = jnp.where(
        (pos == 0)[..., None],
        params["bos"],
        _gather_rows(params["tok_emb"], ids_prev),
    ) + _gather_rows(params["pos_emb"], pos_c)

    rows = jnp.arange(b)[:, None]
    # scatter index: OOB sentinel drops writes for masked positions
    widx = jnp.where(write_ok, pos, s + 1)
    new_caches = []
    chunk_kv = []  # per layer: the chunk's quantized K/V (ring refresh)
    for p, cache in zip(params["blocks"], caches):
        qkv = _ln(x, p["ln1"]) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        kvw = kv * dh
        q = qkv[..., : prior.d].reshape(b, c, h, dh)
        kk, vv = qkv[..., prior.d : prior.d + kvw], qkv[..., prior.d + kvw :]
        kq, ksc = _quantize_rows(kk, kv, cdt)
        vq, vsc = _quantize_rows(vv, kv, cdt)
        chunk_kv.append((kq.reshape(b, c, kv, dh), ksc, vq.reshape(b, c, kv, dh), vsc))
        nc = dict(cache)
        nc["k"] = cache["k"].at[rows, widx].set(
            kq.reshape(b, c, kv, dh), mode="drop"
        )
        nc["v"] = cache["v"].at[rows, widx].set(
            vq.reshape(b, c, kv, dh), mode="drop"
        )
        if cdt == jnp.int8:
            nc["ks"] = cache["ks"].at[rows, widx].set(ksc, mode="drop")
            nc["vs"] = cache["vs"].at[rows, widx].set(vsc, mode="drop")
        new_caches.append(nc)
        # causal mask vs this row's chunk positions
        s_iota = jnp.arange(nc["k"].shape[1])
        mask = s_iota[None, None, :] <= pos_c[:, :, None]
        y = _attend(
            prior, q, nc["k"], nc["v"], nc.get("ks"), nc.get("vs"), mask
        )
        x = x + y @ p["out"]["kernel"] + p["out"]["bias"]
        x = _layer_mlp(p, x)
    logits = _ln(x, params["ln_f"]) @ params["head"]["kernel"] + params["head"]["bias"]
    return new_caches, logits, chunk_kv


def _refresh_ring(ring, tags, chunk_kv, pos, write_ok, ring_len):
    """Scatter the verify chunk's TRUE K/V into the draft ring so future
    draft windows condition on the same values the probe's acceptance was
    measured against (self-referential draft K/V would otherwise persist
    and compound). Rejected-tail entries are tag-masked/overwritten
    before any draft can read them (module docstring)."""
    b, c = pos.shape
    rows = jnp.arange(b)[:, None]
    slot = jnp.where(write_ok, pos % ring_len, ring_len + 1)
    new_tags = tags.at[rows, slot].set(pos, mode="drop")
    new_ring = []
    for rg, (kq, ksc, vq, vsc) in zip(ring, chunk_kv):
        nr = dict(rg)
        nr["k"] = rg["k"].at[rows, slot].set(kq, mode="drop")
        nr["v"] = rg["v"].at[rows, slot].set(vq, mode="drop")
        if ksc is not None:
            nr["ks"] = rg["ks"].at[rows, slot].set(ksc, mode="drop")
            nr["vs"] = rg["vs"].at[rows, slot].set(vsc, mode="drop")
        new_ring.append(nr)
    return new_ring, new_tags


def _draft_step(prior, params, ring, tags, ids_prev, pos, window):
    """One windowed draft step at per-row position ``pos`` (B,).

    Reads the whole ring (dense) masked to tags in [pos-window, pos];
    writes this position's K/V + tag into slot ``pos % ring_len``.
    Returns (ring', tags', logits (B, L)).
    """
    from hopvae_tpu.models.priors.transformer import _ln

    b = ids_prev.shape[0]
    h, dh, kv = prior.heads, prior.d // prior.heads, prior.kv_heads
    s = prior.seq
    cdt = ring[0]["k"].dtype
    ring_len = ring[0]["k"].shape[1]

    pos_c = jnp.clip(pos, 0, s - 1)
    x = jnp.where(
        (pos == 0)[:, None],
        params["bos"],
        _gather_rows(params["tok_emb"], ids_prev),
    ) + _gather_rows(params["pos_emb"], pos_c)

    rows = jnp.arange(b)
    slot = pos_c % ring_len
    new_tags = tags.at[rows, slot].set(pos_c)
    new_ring = []
    x = x[:, None, :]  # (B, 1, d) — reuse the chunk helpers at C=1
    for p, rg in zip(params["blocks"], ring):
        qkv = _ln(x, p["ln1"]) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        kvw = kv * dh
        q = qkv[..., : prior.d].reshape(b, 1, h, dh)
        kk, vv = qkv[..., prior.d : prior.d + kvw], qkv[..., prior.d + kvw :]
        kq, ksc = _quantize_rows(kk, kv, cdt)
        vq, vsc = _quantize_rows(vv, kv, cdt)
        nr = dict(rg)
        nr["k"] = rg["k"].at[rows, slot].set(kq.reshape(b, kv, dh))
        nr["v"] = rg["v"].at[rows, slot].set(vq.reshape(b, kv, dh))
        if cdt == jnp.int8:
            nr["ks"] = rg["ks"].at[rows, slot].set(ksc.reshape(b, kv))
            nr["vs"] = rg["vs"].at[rows, slot].set(vsc.reshape(b, kv))
        new_ring.append(nr)
        mask = (
            (new_tags <= pos_c[:, None])
            & (new_tags > pos_c[:, None] - window)
            & (new_tags >= 0)
        )[:, None, :]  # (B, 1, ring)
        y = _attend(prior, q, nr["k"], nr["v"], nr.get("ks"), nr.get("vs"), mask)
        x = x + y @ p["out"]["kernel"] + p["out"]["bias"]
        x = _layer_mlp(p, x)
    logits = _ln(x[:, 0], params["ln_f"]) @ params["head"]["kernel"] + params["head"]["bias"]
    return new_ring, new_tags, logits


def _empty_ring(prior, b, ring_len, dtype):
    kv, dh = prior.kv_heads, prior.d // prior.heads
    one = {
        "k": jnp.zeros((b, ring_len, kv, dh), dtype),
        "v": jnp.zeros((b, ring_len, kv, dh), dtype),
    }
    if dtype == jnp.int8:
        one["ks"] = jnp.zeros((b, ring_len, kv), jnp.float32)
        one["vs"] = jnp.zeros((b, ring_len, kv), jnp.float32)
    return [dict(one) for _ in range(prior.n_layers)]


def sample_speculative(
    prior,
    params,
    key: jax.Array,
    num_samples: int,
    *,
    k: int = 8,
    window: int = 128,
    with_stats: bool = False,
):
    """Draw ``num_samples`` grids distributed EXACTLY as ``prior.sample``
    would (speculative rejection sampling; draws differ for the same key
    — equality is distributional, tested).

    Returns the (B, r, r, C) float grid, plus a stats dict
    ``{"rounds", "accept_rate"}`` when ``with_stats``.
    """
    params = jax.tree_util.tree_map(jnp.asarray, params)
    b, s = num_samples, prior.seq
    lvl = prior.num_levels
    ring_len = -(-(window + k + 1) // 16) * 16  # eviction-safe capacity

    # main caches always in the (B, L, kv, dh) layout (unlike _decode_step,
    # which flattens kv==1 to 3D) — _attend is layout-uniform here
    caches = _empty_ring(prior, b, s, prior.cache_dtype)
    ring = _empty_ring(prior, b, ring_len, prior.cache_dtype)
    tags = jnp.full((b, ring_len), -1, jnp.int32)
    toks = jnp.zeros((b, s), jnp.int32)

    def cond(carry):
        return jnp.any(carry["t"] < s)

    def body(carry):
        t, last = carry["t"], carry["last"]
        rk = jax.random.fold_in(key, carry["round"])

        # ---- draft k tokens through the windowed ring ------------------
        def draft_body(dc, j):
            ring, tags, prev, logqs, drafts = dc
            ring, tags, lq = _draft_step(prior, params, ring, tags, prev, t + j, window)
            lq = jax.nn.log_softmax(lq, axis=-1)
            d = jax.random.categorical(jax.random.fold_in(rk, j), lq, axis=-1)
            return (
                ring,
                tags,
                d.astype(jnp.int32),
                logqs.at[:, j].set(lq),
                drafts.at[:, j].set(d.astype(jnp.int32)),
            ), None

        (ring, tags, _, logqs, drafts), _ = jax.lax.scan(
            draft_body,
            (
                carry["ring"],
                carry["tags"],
                last,
                jnp.zeros((b, k, lvl), jnp.float32),
                jnp.zeros((b, k), jnp.int32),
            ),
            jnp.arange(k),
        )

        # ---- verify: one chunked full-cache pass over k+1 positions ----
        pos = t[:, None] + jnp.arange(k + 1)[None, :]
        ids_prev = jnp.concatenate([last[:, None], drafts], axis=1)  # (B, k+1)
        write_ok = pos < s
        caches, lp, chunk_kv = _chunk_forward(
            prior, params, carry["caches"], ids_prev, pos, write_ok
        )
        ring, tags = _refresh_ring(ring, tags, chunk_kv, pos, write_ok, ring_len)
        logps = jax.nn.log_softmax(lp, axis=-1)  # (B, k+1, L)

        # ---- accept/reject ---------------------------------------------
        rowsk = jnp.arange(b)[:, None]
        lp_d = logps[:, :k][rowsk, jnp.arange(k)[None, :], drafts]  # (B, k)
        lq_d = logqs[rowsk, jnp.arange(k)[None, :], drafts]
        u = jax.random.uniform(jax.random.fold_in(rk, 1000), (b, k), minval=1e-20)
        accept = jnp.log(u) < (lp_d - lq_d)  # (B, k)
        # first rejection index per row; k = all accepted
        n_acc = jnp.argmax(
            jnp.concatenate([~accept, jnp.ones((b, 1), bool)], axis=1), axis=1
        ).astype(jnp.int32)

        # residual distribution at the rejection position: max(p - q, 0)
        p_rej = jnp.take_along_axis(
            logps[:, :k], jnp.minimum(n_acc, k - 1)[:, None, None], axis=1
        )[:, 0]
        q_rej = jnp.take_along_axis(
            logqs, jnp.minimum(n_acc, k - 1)[:, None, None], axis=1
        )[:, 0]
        resid = jnp.maximum(jnp.exp(p_rej) - jnp.exp(q_rej), 0.0)
        # p == q numerically => rejection has probability 0, but guard the
        # all-zero residual with p itself rather than emitting NaNs
        resid = jnp.where(
            jnp.sum(resid, axis=-1, keepdims=True) > 0.0, resid, jnp.exp(p_rej)
        )
        fin_key = jax.random.fold_in(rk, 2000)
        resampled = jax.random.categorical(fin_key, jnp.log(resid + 1e-30), axis=-1)
        bonus = jax.random.categorical(fin_key, logps[:, k], axis=-1)
        final = jnp.where(n_acc == k, bonus, resampled).astype(jnp.int32)

        # ---- commit accepted tokens ------------------------------------
        cpos = jnp.arange(k + 1)[None, :]
        tok_vec = jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
        tok_vec = jnp.where(cpos == n_acc[:, None], final[:, None], tok_vec)
        valid = (cpos <= n_acc[:, None]) & (pos < s)
        toks = carry["toks"].at[
            rowsk, jnp.where(valid, pos, s + 1)
        ].set(tok_vec, mode="drop")

        t_new = jnp.minimum(t + n_acc + 1, s)
        adv = t_new - t  # ≥ 1 for unfinished rows
        last_new = jnp.where(
            t < s,
            tok_vec[jnp.arange(b), jnp.minimum(n_acc, k)],
            last,
        )
        return {
            "t": t_new,
            "last": last_new,
            "caches": caches,
            "ring": ring,
            "tags": tags,
            "toks": toks,
            "round": carry["round"] + 1,
            "accepted": carry["accepted"] + jnp.sum(jnp.where(t < s, adv, 0)),
        }

    init = {
        "t": jnp.zeros((b,), jnp.int32),
        "last": jnp.zeros((b,), jnp.int32),
        "caches": caches,
        "ring": ring,
        "tags": tags,
        "toks": toks,
        "round": jnp.zeros((), jnp.int32),
        "accepted": jnp.zeros((), jnp.int32),
    }
    out = jax.lax.while_loop(cond, body, init)
    r = prior.representation_dim
    grid = out["toks"].reshape(b, r, r, prior.index_dim).astype(jnp.float32)
    if with_stats:
        stats = {
            "rounds": out["round"],
            "tokens_per_round": out["accepted"] / jnp.maximum(out["round"], 1) / b,
        }
        return grid, stats
    return grid
