#!/bin/bash
# Round-4 campaign 3: sequential metric banking after the relay recovery.
# Each stage: own timeout + artifact pair; a hang costs one stage only.
set -u
cd /root/repo
D=.round4
echo "=== campaign3 start $(date -u +%FT%TZ) ==="
run() { # name timeout_s env... -- args...
  local name=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  echo "=== $name start $(date -u +%FT%TZ) ==="
  env "${envs[@]}" timeout "$to" python bench.py "$@" \
    > "$D/$name.json" 2> "$D/$name.log"
  echo "=== $name rc=$? $(date -u +%FT%TZ) ==="
  tail -1 "$D/$name.json" 2>/dev/null
}
# 1) confirm steady k=16 + verify with committed code; fine sub-phase profile
run s12_delay_enc_fine 3600 DELAY_ENC_PROFILE=1 DELAY_ENC_PROFILE_FINE=1 -- \
    --workload delay_enc --k 16 --repeats 3 --budget 3500
# 2) pose_enc k=11 (compile continues from cached progress)
run s13_pose_enc 3000 DELAY_ENC_PROFILE=1 -- \
    --workload pose_enc --repeats 3 --budget 2900
# 3) batch-4 DP throughput
run s14_batch 4200 DELAY_ENC_PROFILE=1 -- \
    --workload batch --batch 4 --budget 4100
# 4) k=17 scaling row
run s15_delay_enc_k17 5400 DELAY_ENC_PROFILE=1 -- \
    --workload delay_enc --k 17 --repeats 2 --budget 5300
# 5) sweeps
run s16_msm 1800 NONE=1 -- --workload msm --budget 1700
run s17_ntt 1200 NONE=1 -- --workload ntt --budget 1100
echo "=== campaign3 end $(date -u +%FT%TZ) ==="
