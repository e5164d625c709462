#!/bin/bash
# Flagship RL training: CS-MRI PnP-ADMM 5x6, batch 48 (the reference's
# csmri_admm_5x6_48 protocol, tasks/csmri/script.sh:1). Sized for a
# single-session TPU budget; resume with -r logs/csmri_admm_5x6_48/ckpt/....
# Usage: scripts/train_flagship.sh [train_steps] [extra args...]
set -e
cd "$(dirname "$0")/.."
STEPS=${1:-3000}
shift || true
exec python -m tfpnp_tpu --task csmri --solver admm --exp csmri_admm_5x6_48 \
  --env_batch 48 --rmsize 480 --warmup 20 --train_steps "$STEPS" \
  --max_episode_step 6 --action_pack 5 --episode_train_times 10 \
  --validate_interval 50 --save_freq 300 -lp 0.05 -le 0.05 "$@"
