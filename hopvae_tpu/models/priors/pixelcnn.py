"""PixelCNN autoregressive prior over the discrete Hopfield latent grid.

The reference consumes a PixelCNN via an **absent** git submodule
(``joejenb/PixelCNN``, ``.gitmodules:1-3`` — never vendored; SURVEY.md
§2.11), so this is a from-scratch rebuild of the standard masked-conv
PixelCNN (van den Oord et al. 2016) against the interface fixed by the
reference call sites:

- ctor config carries ``num_channels = index_dim`` and
  ``num_categories = num_levels`` (``utils/__init__.py:80-82``);
- ``forward(grid) -> logits`` consumed by cross-entropy per position per
  channel (``HopVAE.py:282-284``): ours returns ``(B, r, r, C, L)``
  (JAX-native layout; reference layout is ``(B, L, C, r, r)``);
- ``sample() -> integer grid`` (``HopVAE.py:188``), here
  ``(n, r, r, C)`` float-typed levels;
- ``reconstruct(grid) -> grid`` — latent denoising: teacher-forced
  re-prediction, argmax per position (Normal's is identity).

Causality: raster-scan over pixels with channel ordering *within* a pixel
(channel c may depend on channels < c at its own pixel) — the standard
mask-A first layer / mask-B elsewhere scheme, with feature maps split
into ``index_dim`` groups. Verified by the autoregressive-property test
(logit (i,j,c) independent of inputs at ≥ (i,j,c); SURVEY.md §4.3).

TPU-first sampling: the whole AR loop is one ``lax.scan`` over the r²
pixels running on-device — no host round-trips — batched over samples,
with exact accelerations (per "Fast Generation for Convolutional
Autoregressive Models", PAPERS.md), in three generations that all draw
identically: full-grid-per-pixel scan → per-layer **row caches** → the
production **column-incremental** sampler, where each layer's activations
are cached one column at a time and every per-step quantity is a
handful of tap matmuls (no convolutions in the loop at all). Measured
numbers live in BASELINE.md; see the sampler block comments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hopvae_tpu.ops.conv import conv2d

relu = jax.nn.relu


def _group_mask(kh: int, kw: int, c_in: int, c_out: int, n_groups: int, *, mask_type: str) -> np.ndarray:
    """Binary mask (kh, kw, c_in, c_out) enforcing raster+channel causality.

    Positions strictly above the center row, or left of center in the
    center row, are fully visible. At the center position, input group g_i
    is visible to output group g_o iff g_i < g_o (mask A) or g_i ≤ g_o
    (mask B). Channel groups are contiguous splits of size c/n_groups.
    """
    m = np.zeros((kh, kw, c_in, c_out), np.float32)
    cy, cx = kh // 2, kw // 2
    m[:cy] = 1.0
    m[cy, :cx] = 1.0
    gi = np.arange(c_in) * n_groups // c_in
    go = np.arange(c_out) * n_groups // c_out
    if mask_type == "A":
        center = (gi[:, None] < go[None, :]).astype(np.float32)
    else:
        center = (gi[:, None] <= go[None, :]).astype(np.float32)
    m[cy, cx] = center
    return m


def _masked_conv_init(key, kh, kw, c_in, c_out, n_groups, mask_type, dtype=jnp.float32):
    k_w, k_b = jax.random.split(key)
    fan_in = c_in * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(k_w, (kh, kw, c_in, c_out), dtype, -bound, bound),
        "bias": jax.random.uniform(k_b, (c_out,), dtype, -bound, bound),
        # fixed, non-trainable causality mask (stop_gradient at apply time)
        "mask": jnp.asarray(_group_mask(kh, kw, c_in, c_out, n_groups, mask_type=mask_type)),
    }


def _masked_conv_apply(p, x):
    kernel = p["kernel"] * jax.lax.stop_gradient(p["mask"])
    pad = p["kernel"].shape[0] // 2
    return conv2d(x, kernel, p["bias"], stride=1, padding=pad)


class PixelCNNPrior:
    """Masked-conv PixelCNN over an ``(B, r, r, index_dim)`` level grid."""

    has_params = True

    def __init__(self, config):
        self.index_dim = config.index_dim
        self.representation_dim = config.representation_dim
        self.num_levels = config.num_levels
        # hyperparameters of the absent submodule are unrecoverable; these
        # are standard PixelCNN choices, overridable via config keys
        self.features = getattr(config, "prior_num_filters", 96)
        self.n_res = getattr(config, "prior_num_res_blocks", 4)
        assert self.features % self.index_dim == 0, "features must split into channel groups"

    # ------------------------------------------------------------- params

    def init(self, key) -> dict:
        c, f, lvl = self.index_dim, self.features, self.num_levels
        keys = jax.random.split(key, 3 + 2 * self.n_res)
        params = {
            "conv_in": _masked_conv_init(keys[0], 7, 7, c, f, c, "A"),
            "res": [
                {
                    "conv_a": _masked_conv_init(keys[1 + 2 * i], 3, 3, f, f, c, "B"),
                    "conv_b": _masked_conv_init(keys[2 + 2 * i], 1, 1, f, f, c, "B"),
                }
                for i in range(self.n_res)
            ],
            "conv_out1": _masked_conv_init(keys[-2], 1, 1, f, f, c, "B"),
            "conv_out2": _masked_conv_init(keys[-1], 1, 1, f, c * lvl, c, "B"),
        }
        return params

    # ------------------------------------------------------------ forward

    def forward(self, params, grid: jax.Array) -> jax.Array:
        """Level grid (B, r, r, C) [0, L-1] floats → logits (B, r, r, C, L)."""
        b, r = grid.shape[0], self.representation_dim
        x = grid.astype(jnp.float32) / (self.num_levels - 1) * 2.0 - 1.0
        h = _masked_conv_apply(params["conv_in"], x)
        for blk in params["res"]:
            y = _masked_conv_apply(blk["conv_a"], relu(h))
            y = _masked_conv_apply(blk["conv_b"], relu(y))
            h = h + y
        h = _masked_conv_apply(params["conv_out1"], relu(h))
        logits = _masked_conv_apply(params["conv_out2"], relu(h))
        return logits.reshape(b, r, r, self.index_dim, self.num_levels)

    # ------------------------------------------------------------- sample
    #
    # Fast exact sampler: masked-conv causality means a change to pixel
    # (i,j)'s own channels reaches the (i,j) logits ONLY through the
    # convolutions' center taps. So per pixel we run ONE full forward to
    # collect each layer's pre-activation at (i,j) minus its center-tap
    # contribution ("partials" — they depend only on strictly-previous
    # pixels and stay constant across the pixel's channel substeps), then
    # the C sequential channel draws re-run just the center-tap chain —
    # a stack of (f×f) vector-matmuls. r²·C full forwards → r²: ~3× fewer
    # sequential steps, exact to float-summation order.

    def _center_mats(self, params):
        """Center-tap matrices (in, out) of every conv, masks applied."""
        def cen(p):
            k = p["kernel"] * p["mask"]
            return k[k.shape[0] // 2, k.shape[1] // 2]

        return {
            "in": cen(params["conv_in"]),
            "res": [(cen(b["conv_a"]), cen(b["conv_b"])) for b in params["res"]],
            "o1": cen(params["conv_out1"]),
            "o2": cen(params["conv_out2"]),
        }

    def _forward_partials(self, params, grid, i, j, cm=None):
        """Full forward; returns per-layer pre-activations at (i,j) with the
        center-tap contribution removed (1×1 convs are all-center — their
        'partial' is just the bias, handled in the chain)."""
        n = grid.shape[0]
        if cm is None:
            cm = self._center_mats(params)
        x = grid.astype(jnp.float32) / (self.num_levels - 1) * 2.0 - 1.0

        def at_ij(a):
            return jax.lax.dynamic_slice(
                a, (0, i, j, 0), (n, 1, 1, a.shape[-1])
            ).reshape(n, a.shape[-1])

        partials = []
        z = _masked_conv_apply(params["conv_in"], x)
        partials.append(at_ij(z) - at_ij(x) @ cm["in"])
        h = z
        for blk, (ca, _cb) in zip(params["res"], cm["res"]):
            za = _masked_conv_apply(blk["conv_a"], relu(h))
            partials.append(at_ij(za) - relu(at_ij(h)) @ ca)
            y = _masked_conv_apply(blk["conv_b"], relu(za))
            h = h + y
        return partials

    def _center_chain_h(self, params, cm, partials, x_ij):
        """Recompute the (i,j) logits from partials + current pixel vector;
        also returns the per-layer h values at (i,j) — the quantities the
        column-incremental sampler caches once the pixel is final."""
        hs = [partials[0] + x_ij @ cm["in"]]
        h = hs[0]
        for blk, (ca, cb), pa in zip(params["res"], cm["res"], partials[1:]):
            a = pa + relu(h) @ ca
            y = relu(a) @ cb + blk["conv_b"]["bias"]
            h = h + y
            hs.append(h)
        o = relu(h) @ cm["o1"] + params["conv_out1"]["bias"]
        logits = relu(o) @ cm["o2"] + params["conv_out2"]["bias"]
        return logits.reshape(x_ij.shape[0], self.index_dim, self.num_levels), hs

    def _center_chain(self, params, cm, partials, x_ij):
        return self._center_chain_h(params, cm, partials, x_ij)[0]

    # --- row caching (PAPERS.md "Fast Generation for Convolutional
    # Autoregressive Models", TPU shape): per pixel step only ROW i of each
    # layer is recomputed — rows < i are final once their pixels are
    # sampled and live in per-layer caches; masked convs only look at rows
    # ≤ i, so a (rows_above+1)-row window reproduces the full-grid row
    # exactly. Two row passes per step (pre-sample for the logits partials,
    # post-sample to refresh the caches) ≈ 5-10× fewer conv FLOPs than a
    # full-grid forward at r=17.

    @staticmethod
    def _row_conv(p, window):
        """One output row of a masked conv. ``window``: (B, kh//2+1, W, Cin)
        — the rows above plus the center row; below-center rows are
        mask-zero, supplied as bottom padding."""
        kernel = p["kernel"] * jax.lax.stop_gradient(p["mask"])
        kh, kw = kernel.shape[0], kernel.shape[1]
        out = jax.lax.conv_general_dilated(
            window, kernel, (1, 1),
            padding=[(0, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0] + p["bias"]

    def _row_pass(self, params, cm, grid_pad, caches, i):
        """Compute row i of every layer from the padded grid + caches.

        Returns (h_rows, partial_rows): per-layer activations at row i
        (B, W, f) and the center-removed pre-activations feeding
        ``_center_chain``. ``grid_pad`` carries 3 zero rows on top (row i at
        index i+3); ``caches[l]`` carries 1 zero row (row i at index i+1).
        """
        n, w, c = grid_pad.shape[0], grid_pad.shape[2], self.index_dim
        f = self.features
        xw = jax.lax.dynamic_slice(grid_pad, (0, i, 0, 0), (n, 4, w, c))
        xw = xw / (self.num_levels - 1) * 2.0 - 1.0
        # rows above the grid must be conv-padding zeros in NORMALIZED space
        # (raw-level zeros would normalize to -1 and corrupt rows i<3)
        wrow = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 1, 1), 1)
        xw = jnp.where(wrow >= 3 - i, xw, 0.0)
        z0 = self._row_conv(params["conv_in"], xw)
        x_row = xw[:, -1]
        partial_rows = [z0 - x_row @ cm["in"]]
        h_rows = [z0]
        h_prev = z0
        for l, (blk, (ca, _cb)) in enumerate(zip(params["res"], cm["res"])):
            prev = jax.lax.dynamic_slice(caches[l], (0, i, 0, 0), (n, 1, w, f))[:, 0]
            hw = jnp.stack([relu(prev), relu(h_prev)], axis=1)
            za = self._row_conv(blk["conv_a"], hw)
            partial_rows.append(za - relu(h_prev) @ ca)
            # conv_b is masked 1×1: its center matrix IS the whole conv
            cb_full = (blk["conv_b"]["kernel"] * blk["conv_b"]["mask"])[0, 0]
            y = relu(za) @ cb_full + blk["conv_b"]["bias"]
            h_prev = h_prev + y
            h_rows.append(h_prev)
        return h_rows, partial_rows

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _sample_scan_rowcache(self, params, key, num_samples: int):
        r, c, f = self.representation_dim, self.index_dim, self.features
        lvl_scale = self.num_levels - 1
        cm = self._center_mats(params)
        n = num_samples
        grid_pad0 = jnp.zeros((n, r + 3, r, c), jnp.float32)
        caches0 = tuple(jnp.zeros((n, r + 1, r, f), jnp.float32) for _ in range(self.n_res))

        def body(carry, step):
            grid_pad, caches, key = carry
            i = step // r
            j = step % r
            _, partial_rows = self._row_pass(params, cm, grid_pad, caches, i)
            partials = [
                jax.lax.dynamic_slice(pr, (0, j, 0), (n, 1, pr.shape[-1]))[:, 0]
                for pr in partial_rows
            ]
            x_ij = jax.lax.dynamic_slice(
                grid_pad, (0, i + 3, j, 0), (n, 1, 1, c)
            ).reshape(n, c) / lvl_scale * 2.0 - 1.0
            for ch in range(c):
                key, sub = jax.random.split(key)
                logits = self._center_chain(params, cm, partials, x_ij)[:, ch]
                lvl = jax.random.categorical(sub, logits, axis=-1).astype(jnp.float32)
                x_ij = x_ij.at[:, ch].set(lvl / lvl_scale * 2.0 - 1.0)
                grid_pad = jax.lax.dynamic_update_slice(
                    grid_pad, lvl.reshape(n, 1, 1, 1), (0, i + 3, j, ch)
                )
            # refresh the caches ONLY at the last pixel of the row — that is
            # the only point where the next reader (row i+1) needs row i
            # final; refreshing every step would double the row-pass FLOPs
            def refresh(args):
                grid_pad, caches = args
                h_rows, _ = self._row_pass(params, cm, grid_pad, caches, i)
                return tuple(
                    jax.lax.dynamic_update_slice(cache, row[:, None], (0, i + 1, 0, 0))
                    for cache, row in zip(caches, h_rows[: self.n_res])
                )

            caches = jax.lax.cond(
                j == r - 1, refresh, lambda args: args[1], (grid_pad, caches)
            )
            return (grid_pad, caches, key), None

        (grid_pad, _, _), _ = jax.lax.scan(
            body, (grid_pad0, caches0, key), jnp.arange(r * r)
        )
        return grid_pad[:, 3:]

    # --- column-incremental sampler (v3, the production path): no row
    # convs at all. Per pixel step, each layer's partial at (i,j) is built
    # from a handful of taps — the 7×7 first-layer window gathered from the
    # padded grid, and for each 3×3 block three above-taps from the
    # previous-row cache plus one left-tap from the current-row cache —
    # then the channel chain runs as before, and the resulting per-layer
    # h(i,j) finals are written into the current-row cache one column at a
    # time. Removes the two O(W) row passes per step AND the lax.cond that
    # copied the whole multi-MB cache tuple through its identity branch
    # every step. Same RNG stream as the row-cache sampler (draws agree;
    # logits equal to float-summation order).

    def _col_taps(self, params):
        """Static tap matrices for the column-incremental partials."""
        kin = params["conv_in"]["kernel"] * params["conv_in"]["mask"]
        kin = kin.at[3, 3].set(0.0)  # center tap excluded from partials
        taps = {"in": kin[:4].reshape(-1, kin.shape[-1]), "in_b": params["conv_in"]["bias"]}
        taps["res"] = []
        for blk in params["res"]:
            ka = blk["conv_a"]["kernel"] * blk["conv_a"]["mask"]
            taps["res"].append(
                {
                    "above": ka[0].reshape(-1, ka.shape[-1]),  # (3f, f)
                    "left": ka[1, 0],  # (f, f)
                    "bias": blk["conv_a"]["bias"],
                }
            )
        return taps

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _sample_scan_colchain(self, params, key, num_samples: int):
        r, c, f = self.representation_dim, self.index_dim, self.features
        lvl_scale = self.num_levels - 1
        cm = self._center_mats(params)
        taps = self._col_taps(params)
        n = num_samples

        # raw-level grid with 3 pad rows on top and 3 pad cols each side
        # (the 7×7 first conv's full past window is a static-size slice)
        grid_pad0 = jnp.zeros((n, r + 3, r + 6, c), jnp.float32)
        # h_b finals, double-buffered by ROW PARITY: one (n, 2, r+2, f)
        # buffer per layer — col jj at index jj+1, permanent zero pads at
        # 0 and r+1; row i writes plane i&1 and reads its above-taps from
        # plane 1-(i&1). This removes round-4's per-step row transition
        # (two full-tensor jnp.where selects per layer per pixel — at r=33
        # that reread+rewrote all 4 caches 1089×/draw, the HBM wall behind
        # the batch-2048 regression, BASELINE.md): no resets are needed
        # because the left tap at column 0 reads the zero pad and columns
        # 1..r of a plane are fully overwritten before it is read again,
        # so every cache touch is a small slice XLA updates in place.
        hb0 = tuple(
            jnp.zeros((n, 2, r + 2, f), jnp.float32) for _ in range(self.n_res)
        )

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 7, 1), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 7, 1), 2)

        def body(carry, step):
            grid_pad, hbufs, key = carry
            i = step // r
            j = step % r
            p = i & 1  # current row's plane; 1 - p holds row i-1

            # layer-0 partial: masked 7×7 window, center tap zeroed in taps
            win = jax.lax.dynamic_slice(grid_pad, (0, i, j, 0), (n, 4, 7, c))
            valid = (row_iota >= 3 - i) & (col_iota >= 3 - j) & (col_iota < r + 3 - j)
            xw = jnp.where(valid, win / lvl_scale * 2.0 - 1.0, 0.0)
            partials = [xw.reshape(n, -1) @ taps["in"] + taps["in_b"]]

            # block partials: 3 above-taps + 1 left-tap
            for b in range(self.n_res):
                above = relu(
                    jax.lax.dynamic_slice(hbufs[b], (0, 1 - p, j, 0), (n, 1, 3, f))[:, 0]
                )
                left = relu(
                    jax.lax.dynamic_slice(hbufs[b], (0, p, j, 0), (n, 1, 1, f))[:, 0, 0]
                )
                partials.append(
                    above.reshape(n, -1) @ taps["res"][b]["above"]
                    + left @ taps["res"][b]["left"]
                    + taps["res"][b]["bias"]
                )

            x_ij = jax.lax.dynamic_slice(
                grid_pad, (0, i + 3, j + 3, 0), (n, 1, 1, c)
            ).reshape(n, c) / lvl_scale * 2.0 - 1.0
            lvls = []
            for ch in range(c):
                key, sub = jax.random.split(key)
                logits = self._center_chain(params, cm, partials, x_ij)[:, ch]
                lvl = jax.random.categorical(sub, logits, axis=-1).astype(jnp.float32)
                lvls.append(lvl)
                x_ij = x_ij.at[:, ch].set(lvl / lvl_scale * 2.0 - 1.0)
            grid_pad = jax.lax.dynamic_update_slice(
                grid_pad, jnp.stack(lvls, -1).reshape(n, 1, 1, c), (0, i + 3, j + 3, 0)
            )

            # pixel final → h_b(i,j) into this row's parity plane
            _, hs = self._center_chain_h(params, cm, partials, x_ij)
            hbufs = tuple(
                jax.lax.dynamic_update_slice(hb, h[:, None, None], (0, p, j + 1, 0))
                for hb, h in zip(hbufs, hs[: self.n_res])
            )
            return (grid_pad, hbufs, key), None

        (grid_pad, _, _), _ = jax.lax.scan(
            body, (grid_pad0, hb0, key), jnp.arange(r * r)
        )
        return grid_pad[:, 3:, 3 : r + 3]

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _sample_scan(self, params, key, num_samples: int):
        r, c = self.representation_dim, self.index_dim
        lvl_scale = self.num_levels - 1
        cm = self._center_mats(params)
        grid0 = jnp.zeros((num_samples, r, r, c), jnp.float32)

        def body(carry, step):
            grid, key = carry
            i = step // r
            j = step % r
            partials = self._forward_partials(params, grid, i, j, cm)
            x_ij = jax.lax.dynamic_slice(
                grid, (0, i, j, 0), (num_samples, 1, 1, c)
            ).reshape(num_samples, c) / lvl_scale * 2.0 - 1.0
            for ch in range(c):  # unrolled: C sequential channel draws
                key, sub = jax.random.split(key)
                logits = self._center_chain(params, cm, partials, x_ij)[:, ch]
                lvl = jax.random.categorical(sub, logits, axis=-1).astype(jnp.float32)
                x_ij = x_ij.at[:, ch].set(lvl / lvl_scale * 2.0 - 1.0)
                grid = jax.lax.dynamic_update_slice(
                    grid, lvl.reshape(num_samples, 1, 1, 1), (0, i, j, ch)
                )
            return (grid, key), None

        (grid, _), _ = jax.lax.scan(body, (grid0, key), jnp.arange(r * r))
        return grid

    def sample(self, params, key: jax.Array, num_samples: int = 1) -> jax.Array:
        """On-device AR sampling: one ``lax.scan`` over the r² pixels with
        column-incremental parity-double-buffered layer caches +
        center-tap channel substeps (see block comments above). Exact —
        same RNG stream and float-summation-order logits as the row-cache
        and full-grid scans. Round 5's double buffer removed the per-step
        full-cache selects, which fixed the large-batch regression and
        roughly doubled the big-grid frontier (one v5e, chained device
        timing: r=33: 10.6k samples/s @1024 → 14.5k @4096, vs round-4's
        7.1k peak that REGRESSED to 3.7k @2048; r=17: 55.9k @2048, 1.62×
        round 4)."""
        return self._sample_scan_colchain(params, key, num_samples)

    # -------------------------------------------------------- reconstruct

    def reconstruct(self, params, grid: jax.Array) -> jax.Array:
        """Teacher-forced denoise: argmax re-prediction per position."""
        logits = self.forward(params, grid)
        return jnp.argmax(logits, axis=-1).astype(grid.dtype)

    def interpolate(self, params, x: jax.Array, y: jax.Array) -> jax.Array:
        return (x + y) / 2
