#!/usr/bin/env bash
# TPU-VM launch wrapper — the TPU-native equivalent of the reference's
# Azure ML job (/root/reference/AML_Job.yml: single node, mounted dataset,
# `python main.py --data ...`).
#
# Usage:
#   deploy/tpu_job.sh <tpu-name> <zone> <gcs-or-local-data-path> [config]
#
# Creates nothing; assumes an existing TPU VM (v5e). For multi-host slices,
# run via `gcloud compute tpus tpu-vm ssh --worker=all` — the training step
# shards over all visible chips through the (data, model) mesh
# automatically (hopvae_tpu/parallel/mesh.py).
set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
DATA="${3:?data path}"
CONFIG="${4:-ffhq_64}"

# DRY_RUN=1 prints the launch command instead of executing it (no gcloud /
# no cluster needed) — lets tests/test_deploy.py execute this script
# end-to-end rather than only syntax-checking it.
GCLOUD="gcloud"
if [[ "${DRY_RUN:-0}" == "1" ]]; then
  GCLOUD="echo gcloud"
fi

${GCLOUD} compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all --command "
  cd ~/hopvae-tpu &&
  HOPVAE_MULTIHOST=1 python -m hopvae_tpu.train \
    --config ${CONFIG} \
    --data ${DATA} \
    --out outputs/${CONFIG} \
    --production
"
# HOPVAE_MULTIHOST=1 triggers jax.distributed.initialize() (auto-detected
# coordinator on TPU VMs) so the (data, model) mesh spans the whole slice.
