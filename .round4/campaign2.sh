#!/bin/bash
# Round-4 capture campaign, stage 2+: waits for the stage-1 k=16 bench
# (PID in .round4/campaign_pid) to exit, then banks the remaining metrics
# sequentially.  Every stage runs under timeout with its own artifact pair
# (.json = stdout metric lines, .log = stderr) so a relay outage or hang
# costs one stage, not the campaign.
set -u
cd /root/repo
D=.round4
echo "=== campaign2 start $(date -u +%FT%TZ) ==="

# wait for stage 1 (poll: the pid belongs to a different shell session)
S1=$(awk '{print $3}' "$D/campaign_pid" 2>/dev/null)
while [ -n "$S1" ] && kill -0 "$S1" 2>/dev/null; do sleep 30; done
echo "=== stage1 done $(date -u +%FT%TZ) ==="

run() { # name timeout_s args...
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  DELAY_ENC_PROFILE=1 timeout "$to" python bench.py "$@" \
    > "$D/$name.json" 2> "$D/$name.log"
  echo "=== $name rc=$? $(date -u +%FT%TZ) ==="
  tail -1 "$D/$name.json" 2>/dev/null
}

# stage-1 retry if it produced no steady metric (compiles now cached, so a
# retry is much cheaper than the first attempt)
if ! grep -q '"repeats"' "$D/s1_delay_enc_k16.json" 2>/dev/null; then
  run s1b_delay_enc_k16 4200 --workload delay_enc --k 16 --repeats 3 --budget 4100
fi
# cheap banks
run s2_verify      300  --workload verify --no-probe
run s3_pose_enc   2400  --workload pose_enc --repeats 3 --budget 2300
run s4_batch      3000  --workload batch --batch 4 --budget 2900
# MSM default decision data: k=16 delay_enc with base-16 tables
echo "=== s5 start $(date -u +%FT%TZ) ==="
DELAY_ENC_MSM=b16 DELAY_ENC_PROFILE=1 timeout 2400 python bench.py \
  --workload delay_enc --k 16 --repeats 2 --budget 2300 \
  > "$D/s5_delay_enc_b16.json" 2> "$D/s5_delay_enc_b16.log"
echo "=== s5 rc=$? $(date -u +%FT%TZ) ==="; tail -1 "$D/s5_delay_enc_b16.json" 2>/dev/null
# scaling rows
run s6_delay_enc_k17 5400 --workload delay_enc --k 17 --repeats 2 --budget 5300
run s7_mod_pow_k16   2400 --workload mod_pow --k 16 --repeats 2 --budget 2300
# sweeps
run s8_msm        1800  --workload msm --budget 1700
run s9_ntt        1200  --workload ntt --budget 1100
echo "=== campaign2 end $(date -u +%FT%TZ) ==="
