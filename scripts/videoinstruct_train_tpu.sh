#!/usr/bin/env bash
# Multi-host TPU pod training launcher — the reference's SLURM equivalent
# (reference: scripts/videoinstruct_train.slurm: 1 node x 4 GPUs srun).
# On a TPU pod slice, run this on every host (e.g. via gcloud compute tpus
# tpu-vm ssh --worker=all); jax.distributed picks up the pod topology from
# the TPU environment automatically.
set -euo pipefail
EXPERIMENT=${1:-LSTP_SF_blip2flant5xl_videoinstruct}
shift || true
python -m videotgb_tpu.train experiment="$EXPERIMENT" "$@"
