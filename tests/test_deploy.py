"""The cloud launcher (SURVEY.md §2.19) can't reach a cluster here (no
gcloud), but it must be valid shell, reference real repo entry points, and
execute end-to-end under DRY_RUN=1 — not rot as doc-level shell."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "deploy", "tpu_job.sh")


def test_tpu_job_script_is_valid_bash():
    assert os.path.exists(SCRIPT)
    subprocess.run(["bash", "-n", SCRIPT], check=True)
    src = open(SCRIPT).read()
    # the entry points it launches must exist
    assert "hopvae_tpu.train" in src or "main.py" in src


def test_tpu_job_dry_run_builds_the_launch_command():
    out = subprocess.run(
        ["bash", SCRIPT, "my-tpu", "us-central2-b", "gs://bucket/ffhq", "ffhq_64_scaled"],
        env={**os.environ, "DRY_RUN": "1"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert out.startswith("gcloud compute tpus tpu-vm ssh my-tpu")
    assert "--zone us-central2-b" in out
    assert "--worker=all" in out
    assert "--config ffhq_64_scaled" in out
    assert "--data gs://bucket/ffhq" in out
    assert "HOPVAE_MULTIHOST=1" in out

    # every flag the wrapper passes must be a real trainer flag
    trainer_src = open(os.path.join(REPO, "hopvae_tpu", "train.py")).read()
    for flag in ("--config", "--data", "--out", "--production"):
        assert flag in out, f"launcher no longer passes {flag}"
        assert f'"{flag}"' in trainer_src, f"trainer no longer accepts {flag}"
