"""HopVAE — VQ-VAE with a modern-Hopfield bottleneck, TPU-native.

Behavioral parity with ``/root/reference/HopVAE.py:128-293``:

- ``forward``: encoder → pre-VQ 1×1 conv → Hopfield retrieval →
  embedding→index lookup → sigmoid → straight-through round to
  ``num_levels`` → index→embedding round-trip, trained only via
  ``embedding_recon_loss``; the decoder sees the **pre-quantization**
  retrieval (``HopVAE.py:248-293`` — the subtlety that makes ``sample()``
  work, SURVEY.md §3.1). When ``fit_prior``, adds the prior's
  cross-entropy in bits over the detached quantized grid.
- ``sample``: prior sample → normalize → index→embedding → decoder
  (``HopVAE.py:187-200``).
- ``interpolate``: average pre-VQ latents, clamp-via-relu (not sigmoid —
  reference asymmetry at ``HopVAE.py:221-222`` vs ``:264``), quantize,
  prior.reconstruct denoise, decode (``HopVAE.py:202-243``).
- ``post_vq_conv`` params exist but are never applied (dead weight kept
  for checkpoint compatibility, ``HopVAE.py:173-176``).

All activations are NHWC; the latent grid is ``(B, r, r, ·)`` and is
flattened to ``(B, r², ·)`` for the Hopfield lookups — identical ordering
to the reference's NCHW→permute→view dance, without the copies.

The Hopfield bottleneck runs either as pure-jnp attention (``impl="xla"``)
or the fused Pallas kernel (``impl="pallas"``); both must agree to
tolerance (checkpoint-parity gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hopvae_tpu.models import layers
from hopvae_tpu.models.priors import get_prior
from hopvae_tpu.ops.conv import conv2d
from hopvae_tpu.ops.hopfield import hopfield_lookup, init_hopfield_params
from hopvae_tpu.ops.ste import straight_through_round


from hopvae_tpu.ops.bottleneck import bottleneck_params, hopfield_bottleneck


def _lookup(params, x, impl: str):
    """One Hopfield lookup honoring the model's ``impl`` — sample and
    interpolate run the same streaming Pallas kernel as the forward
    bottleneck when ``impl="pallas"``."""
    if impl == "pallas":
        from hopvae_tpu.ops.hopfield_pallas import hopfield_lookup_pallas

        return hopfield_lookup_pallas(params, x)
    return hopfield_lookup(params, x)


class HopVAE:
    """Functional model: ``init(key) -> params`` + pure apply methods.

    ``params`` is a plain nested dict (a transparent pytree) whose top-level
    keys mirror the reference's module names (encoder, pre_vq_conv,
    hopfield, embedding_to_index, index_to_embedding, post_vq_conv,
    decoder, prior) so the torch-checkpoint converter maps 1:1.
    """

    def __init__(self, config, impl: str = "xla", compute_dtype=None):
        """``compute_dtype=jnp.bfloat16`` runs the conv stacks in bf16 on
        the MXU (f32 master params, casts fused by XLA; the Hopfield
        bottleneck and losses stay f32 — softmax/LN stability and parity).
        Default f32 end-to-end for checkpoint parity."""
        self.config = config
        self.impl = impl
        self.compute_dtype = compute_dtype
        # set by the Trainer for multi-device meshes when impl="pallas":
        # the bottleneck then runs per-device via shard_map (XLA cannot
        # partition a Pallas custom call by itself); shard_patterns
        # additionally splits the pattern memories over the model axis
        # with a cross-shard softmax merge
        self.mesh = None
        self.shard_patterns = False
        self.num_embeddings = config.num_embeddings
        self.embedding_dim = config.embedding_dim
        self.index_dim = config.index_dim
        self.representation_dim = config.representation_dim
        self.num_levels = config.num_levels
        self.prior = get_prior(config)

    def _cast(self, tree):
        if self.compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            tree,
        )

    # ---------------------------------------------------------------- init

    def init(self, key: jax.Array) -> dict:
        cfg = self.config
        keys = jax.random.split(key, 8)
        d, di, m = cfg.embedding_dim, cfg.index_dim, cfg.num_embeddings
        params = {
            "encoder": layers.init_encoder(
                keys[0], cfg.num_channels, cfg.num_hiddens,
                cfg.num_residual_layers, cfg.num_residual_hiddens,
            ),
            "pre_vq_conv": layers._torch_conv_init(keys[1], 1, 1, cfg.num_hiddens, d),
            "hopfield": init_hopfield_params(keys[2], d, d, m),
            "embedding_to_index": init_hopfield_params(keys[3], d, di, m),
            "index_to_embedding": init_hopfield_params(keys[4], di, d, m),
            # dead weight, kept for checkpoint compatibility (HopVAE.py:173-176)
            "post_vq_conv": layers._torch_conv_init(keys[5], 1, 1, di, di),
            "decoder": layers.init_decoder(
                keys[6], d, cfg.num_channels, cfg.num_hiddens,
                cfg.num_residual_layers, cfg.num_residual_hiddens,
            ),
            "prior": self.prior.init(keys[7]),
        }
        return params

    # ------------------------------------------------------------- encode

    def _encode_to_tokens(self, params, x):
        """Image (B,H,W,C) → pre-VQ latent tokens (B, r², d), f32 out."""
        cfg = self.config
        expected = (cfg.image_size, cfg.image_size, cfg.num_channels)
        if x.ndim != 4 or tuple(x.shape[1:]) != expected:
            hint = ""
            if x.ndim == 4 and tuple(x.shape[1:]) == (
                cfg.num_channels, cfg.image_size, cfg.image_size
            ):
                # the reference (torch) is channels-first; this framework is
                # NHWC — the single most likely migration mistake
                hint = " — input looks NCHW; transpose with x.transpose(0, 2, 3, 1)"
            raise ValueError(
                f"expected NHWC input of shape (B, {expected[0]}, {expected[1]}, "
                f"{expected[2]}) for config image_size={cfg.image_size}, got "
                f"{tuple(x.shape)}{hint}"
            )
        enc = self._cast(params["encoder"])
        pre = self._cast(params["pre_vq_conv"])
        z = layers.encoder_apply(enc, self._cast(x))
        z = conv2d(z, pre["kernel"], pre["bias"])
        b = z.shape[0]
        z = z.astype(jnp.float32)
        return z.reshape(b, self.representation_dim**2, self.embedding_dim)

    def _tokens_to_image(self, params, z_embeddings):
        """Latent tokens (B, r², d) → decoded image (B,H,W,C), f32 out."""
        b = z_embeddings.shape[0]
        r = self.representation_dim
        grid = self._cast(z_embeddings).reshape(b, r, r, self.embedding_dim)
        out = layers.decoder_apply(self._cast(params["decoder"]), grid)
        return out.astype(jnp.float32)

    # ------------------------------------------------------------ forward

    def forward(
        self,
        params,
        x: jax.Array,
        *,
        fit_prior: bool = False,
    ):
        """Returns ``(x_recon, aux_loss)`` exactly as the reference's
        ``forward`` (``HopVAE.py:248-293``)."""
        cfg = self.config
        r = self.representation_dim
        with jax.named_scope("encoder"):
            z = self._encode_to_tokens(params, x)

        with jax.named_scope("hopfield_bottleneck"):
            if self.impl == "pallas" and self.mesh is not None and self.mesh.devices.size > 1:
                from hopvae_tpu.ops.hopfield_pallas import hopfield_bottleneck_pallas_sharded

                z_embeddings, z_indices_quantised, z_embeddings_recon = (
                    hopfield_bottleneck_pallas_sharded(
                        bottleneck_params(params), z, self.num_levels, self.mesh,
                        shard_patterns=self.shard_patterns,
                    )
                )
            else:
                z_embeddings, z_indices_quantised, z_embeddings_recon = hopfield_bottleneck(
                    bottleneck_params(params), z, self.num_levels, impl=self.impl
                )
            embedding_recon_loss = jnp.mean((z_embeddings_recon - z_embeddings) ** 2)

        with jax.named_scope("decoder"):
            x_recon = self._tokens_to_image(params, z_embeddings)

        if fit_prior:
            b = x.shape[0]
            grid = jax.lax.stop_gradient(
                z_indices_quantised.reshape(b, r, r, self.index_dim)
            )
            logits = self.prior.forward(params["prior"], grid)
            targets = grid.astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            # nats → bits, matching `* np.log2(np.exp(1))` at HopVAE.py:285
            z_prediction_error = jnp.mean(ce) * jnp.log2(jnp.exp(1.0)).astype(ce.dtype)
            return x_recon, z_prediction_error + embedding_recon_loss

        return x_recon, embedding_recon_loss

    def reconstruct(self, params, x: jax.Array):
        """Parity with ``HopVAE.reconstruct`` (``HopVAE.py:245-246``)."""
        return self.forward(params, x)

    # ------------------------------------------------------------- sample

    def sample(self, params, key: jax.Array, num_samples: int = 1) -> jax.Array:
        """Unconditional generation (``HopVAE.py:187-200``)."""
        grid = self.prior.sample(params["prior"], key, num_samples)
        z_indices = grid.astype(jnp.int32).astype(jnp.float32) / (self.num_levels - 1)
        b = z_indices.shape[0]
        tokens = z_indices.reshape(b, self.representation_dim**2, self.index_dim)
        z_embeddings = _lookup(params["index_to_embedding"], tokens, self.impl)
        return self._tokens_to_image(params, z_embeddings)

    # -------------------------------------------------------- interpolate

    def interpolate(self, params, x: jax.Array, y: jax.Array) -> jax.Array:
        """Latent-space interpolation (``HopVAE.py:202-243``). Returns ``x``
        unchanged on shape mismatch, like the reference."""
        if x.shape != y.shape:
            return x
        r = self.representation_dim
        zx = self._encode_to_tokens(params, x)
        zy = self._encode_to_tokens(params, y)
        z = (zx + zy) / 2

        z_embeddings = _lookup(params["hopfield"], z, self.impl)
        z_indices = _lookup(params["embedding_to_index"], z_embeddings, self.impl)
        # clamp-to-[0,1] via relu pair — reference asymmetry vs sigmoid in
        # forward (HopVAE.py:221-222)
        z_indices = jax.nn.relu(z_indices)
        z_indices = 1.0 - jax.nn.relu(1.0 - z_indices)
        z_indices_quantised = straight_through_round(z_indices * (self.num_levels - 1))

        b = x.shape[0]
        grid = z_indices_quantised.reshape(b, r, r, self.index_dim)
        grid = self.prior.reconstruct(params["prior"], grid)
        z_indices = grid / (self.num_levels - 1)

        tokens = z_indices.reshape(b, r * r, self.index_dim)
        z_embeddings = _lookup(params["index_to_embedding"], tokens, self.impl)
        return jax.lax.stop_gradient(self._tokens_to_image(params, z_embeddings))
