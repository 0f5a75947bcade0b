#!/usr/bin/env bash
# Stage-2 TGB sampler training (reference: scripts/*.slurm TG recipe)
set -euo pipefail
python -m videotgb_tpu.train experiment=LSTP_TG_blip2flant5xl_videoinstruct "$@"
