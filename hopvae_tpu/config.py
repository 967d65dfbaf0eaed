"""Config wrapper — attribute access over the reference dict schema.

Equivalent of the reference's ``MakeConfig`` (``utils/__init__.py:14-16``)
with a copy (the reference aliases and mutates the dict in place) and a
``to_dict`` for logging/serialization.
"""

from __future__ import annotations


class MakeConfig:
    def __init__(self, config: dict):
        self.__dict__ = dict(config)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    def __repr__(self) -> str:  # pragma: no cover
        return f"MakeConfig({self.__dict__})"


def load_config(name: str) -> MakeConfig:
    from hopvae_tpu.configs import get_config

    return MakeConfig(get_config(name))


def apply_overrides(config, sets: list, *, config_name: str = "") -> None:
    """Apply ``--set KEY=VALUE`` overrides in place (values parsed as
    Python literals when possible). Warns on keys absent from the config —
    a misspelled key would otherwise be silently ignored by everything
    downstream; new keys are still allowed (prior_* keys, for example,
    are config-dependent)."""
    import ast
    import sys

    for kv in sets:
        key, eq, val = kv.partition("=")
        if not eq:
            raise ValueError(f"--set expects KEY=VALUE, got {kv!r}")
        # prior_* keys are legitimately config-dependent (the Transformer
        # prior's d_model/heads/layers/attn/blocks, the PixelCNN's
        # filters/res_blocks) and appear in no base config — don't cry
        # typo on the documented workflow
        if key not in config.__dict__ and not key.startswith("prior_"):
            print(
                f"warning: --set {key} is not a {config_name or 'known'} "
                f"config key (setting it anyway)",
                file=sys.stderr,
            )
        try:
            config.__dict__[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            config.__dict__[key] = val
