"""The committed example must stay runnable — it is the library-surface
quickstart a reference user lands on first (docs/MIGRATION.md)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))


def test_quickstart_runs(tmp_path):
    import quickstart

    out = str(tmp_path / "q")
    quickstart.main(["--epochs", "1", "--n-train", "32", "--out", out])
    for name in ("quickstart_inputs.png", "quickstart_recons.png", "quickstart_samples.png"):
        assert os.path.exists(os.path.join(out, name))
