#!/bin/bash
# Round-3 TPU measurement campaign: runs automatically when the relay
# recovers.  Each stage logs to .round3/; stages are ordered by scoring
# priority (a warm, driver-parsable k=16 number first).
cd /root/repo
L=.round3
echo "=== campaign start $(date -u) ===" >> $L/campaign.log

# Stage 1: warm + measure the default (b4) k=16 pipeline, phase breakdown
DELAY_ENC_PROFILE=1 timeout 7000 python bench.py --workload delay_enc \
  --repeats 2 --budget 6600 > $L/s1_delay_enc_b4.json 2> $L/s1_delay_enc_b4.log
echo "stage1 rc=$? $(date -u)" >> $L/campaign.log

# Stage 2: base-16 MSM pipeline (new dot+tree kernels compile here)
DELAY_ENC_MSM=b16 DELAY_ENC_PROFILE=1 timeout 7000 python bench.py \
  --workload delay_enc --repeats 2 --budget 6600 \
  > $L/s2_delay_enc_b16.json 2> $L/s2_delay_enc_b16.log
echo "stage2 rc=$? $(date -u)" >> $L/campaign.log

# Stage 3: Pallas tree compile probe (Mosaic may hang: hard timeout)
timeout 1800 python $L/pallas_probe.py > $L/s3_pallas.log 2>&1
echo "stage3 rc=$? $(date -u)" >> $L/campaign.log

echo "=== campaign done $(date -u) ===" >> $L/campaign.log
