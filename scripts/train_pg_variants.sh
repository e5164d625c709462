#!/bin/bash
# Train the remaining registered-solver policies that have no shipped
# checkpoint yet: pr_pg and ct_pg (reference registers pg for both tasks,
# tasks/pr/solver.py:115-118, tasks/ct/solver.py:90-93, but released no
# checkpoints for them), plus the beyond-reference deblur_admm.
# ONE TPU process at a time — see CLAUDE.md.
# Usage: scripts/train_pg_variants.sh [pr_steps] [ct_steps] [deblur_steps]
set -u
cd "$(dirname "$0")/.."
PR=${1:-2400}
CT=${2:-1800}
DEBLUR=${3:-2400}

run_with_retry() {
  local name=$1; shift
  for attempt in 1 2 3; do
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    if "$@"; then
      echo "=== $name OK ==="
      return 0
    fi
    echo "=== $name failed; waiting out possible chip wedge ==="
    sleep 240
  done
  echo "=== $name FAILED after 3 attempts ==="
  return 1
}

run_with_retry pr_pg python -m tfpnp_tpu --task pr --solver pg \
  --exp pr_pg_5x6_48 --env_batch 48 --rmsize 480 --warmup 20 \
  --train_steps "$PR" --max_episode_step 6 --action_pack 5 \
  --episode_train_times 10 --validate_interval 50 --save_freq 300 \
  -lp 0.05 -le 0.2

run_with_retry ct_pg python -m tfpnp_tpu --task ct --solver pg \
  --exp ct_pg_5x6_48 --env_batch 48 --rmsize 480 --warmup 20 \
  --train_steps "$CT" --max_episode_step 6 --action_pack 5 \
  --episode_train_times 10 --validate_interval 50 --save_freq 300 \
  -lp 0.05 -le 0.2

run_with_retry deblur_admm python -m tfpnp_tpu --task deblur --solver admm \
  --exp deblur_admm_5x6_48 --env_batch 48 --rmsize 480 --warmup 20 \
  --train_steps "$DEBLUR" --max_episode_step 6 --action_pack 5 \
  --episode_train_times 10 --validate_interval 50 --save_freq 300 \
  -lp 0.05 -le 0.2

echo "=== queue complete ==="
