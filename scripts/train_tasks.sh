#!/bin/bash
# Sequential RL training for the non-flagship tasks (run after the
# flagship; ONE TPU process at a time — see CLAUDE.md).
# Usage: scripts/train_tasks.sh [spi_steps] [pr_steps] [ct_steps]
set -e
cd "$(dirname "$0")/.."
SPI=${1:-2400}
PR=${2:-2400}
CT=${3:-1800}

# SPI ADMM 1x10 (reference script.sh: 1-pack, 10-20 steps)
python -m tfpnp_tpu --task spi --exp spi_admm_1x10_48 \
  --env_batch 48 --rmsize 480 --warmup 20 --train_steps "$SPI" \
  --max_episode_step 10 --action_pack 1 --episode_train_times 10 \
  --validate_interval 50 --save_freq 300 -lp 0.05 -le 0.2

# PR iADMM 5x6 (reference pr_admm_5x6_36)
python -m tfpnp_tpu --task pr --solver iadmm --exp pr_iadmm_5x6_48 \
  --env_batch 48 --rmsize 480 --warmup 20 --train_steps "$PR" \
  --max_episode_step 6 --action_pack 5 --episode_train_times 10 \
  --validate_interval 50 --save_freq 300 -lp 0.05 -le 0.2

# CT iADMM 5x6 (30 views)
python -m tfpnp_tpu --task ct --solver iadmm --exp ct_iadmm_5x6_48 \
  --env_batch 48 --rmsize 480 --warmup 20 --train_steps "$CT" \
  --max_episode_step 6 --action_pack 5 --episode_train_times 10 \
  --validate_interval 50 --save_freq 300 -lp 0.05 -le 0.2
