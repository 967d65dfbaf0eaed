"""Packaging surface: the reference is an unpackaged script repo
(`/root/reference/main.py:16` hard-codes its config import); this framework
is pip-installable. Keep pyproject.toml's entry points and version honest.
"""

import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve():
    for name, target in _project()["scripts"].items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_version_matches_package():
    import hopvae_tpu

    assert _project()["version"] == hopvae_tpu.__version__
