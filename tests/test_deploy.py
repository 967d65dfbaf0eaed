"""The cloud launcher (SURVEY.md §2.19) can't be executed here (no gcloud,
no cluster), but it must at least be valid shell and reference real repo
entry points — keeps the doc-level artifact from rotting."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_job_script_is_valid_bash():
    script = os.path.join(REPO, "deploy", "tpu_job.sh")
    assert os.path.exists(script)
    subprocess.run(["bash", "-n", script], check=True)
    src = open(script).read()
    # the entry points it launches must exist
    assert "hopvae_tpu.train" in src or "main.py" in src
