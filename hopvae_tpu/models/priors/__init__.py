"""Prior factory — parity with ``get_prior`` (``/root/reference/utils/__init__.py:71-82``).

The prior protocol (duck-typed in the reference, SURVEY.md §2.11):
``init(key) -> params``, ``forward(params, grid) -> logits``,
``sample(params, key, n) -> grid``, ``reconstruct(params, grid) -> grid``,
``interpolate(params, x, y)``. Grids are ``(B, r, r, index_dim)`` float
integer-levels; logits are ``(B, r, r, index_dim, num_levels)``.
"""

from __future__ import annotations

from hopvae_tpu.models.priors.normal import NormalPrior


def get_prior(config):
    if config.prior == "PixelCNN":
        from hopvae_tpu.models.priors.pixelcnn import PixelCNNPrior

        return PixelCNNPrior(config)
    elif config.prior == "Transformer":
        # third family, no reference counterpart — decoder-only causal
        # transformer with KV-cached lax.scan sampling (same AR order and
        # protocol as the PixelCNN prior); select via --set prior=Transformer
        from hopvae_tpu.models.priors.transformer import TransformerPrior

        return TransformerPrior(config)
    elif config.prior == "None" or config.prior is None:
        # `--set prior=None` literal-evals to Python None; the configs'
        # string convention ("None") and the literal both mean the stub
        return NormalPrior(config)
    raise ValueError(f"unknown prior {config.prior!r}")
