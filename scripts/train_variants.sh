#!/bin/bash
# Train the remaining reference-parity policies sequentially (ONE TPU
# process at a time — see CLAUDE.md). Covers the reference's released
# checkpoint set: csmri_{hqs,pg,apg,red}_5x6_48 (docs/results.md:14-40)
# plus CT (blank in the reference). Retries each run a few times because
# the tunneled chip can wedge for ~5-10 min after a process exits.
# Usage: scripts/train_variants.sh [ct_steps] [variant_steps]
set -u
cd "$(dirname "$0")/.."
CT=${1:-1800}
VS=${2:-2400}

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

run_with_retry ct_iadmm python -m tfpnp_tpu --task ct --solver iadmm \
  --exp ct_iadmm_5x6_48 --env_batch 48 --rmsize 480 --warmup 20 \
  --train_steps "$CT" --max_episode_step 6 --action_pack 5 \
  --episode_train_times 10 --validate_interval 50 --save_freq 300 \
  -lp 0.05 -le 0.2

for sv in hqs pg apg redadmm; do
  run_with_retry "csmri_$sv" python -m tfpnp_tpu --task csmri --solver "$sv" \
    --exp "csmri_${sv}_5x6_48" --env_batch 48 --rmsize 480 --warmup 20 \
    --train_steps "$VS" --max_episode_step 6 --action_pack 5 \
    --episode_train_times 10 --validate_interval 50 --save_freq 300 \
    -lp 0.05 -le 0.2
done
echo "=== queue complete ==="
