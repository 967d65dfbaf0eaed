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
