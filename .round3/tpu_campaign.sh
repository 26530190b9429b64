#!/bin/bash
# Round-3 TPU measurement campaign: runs automatically when the relay
# recovers.  Each stage logs to .round3/; ordered by scoring priority
# (a warm, driver-parsable k=16 number first).  Stages tolerate failure.
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

# Stage 4: MSM sweep to 2^24 (chunked above 2^20)
timeout 5400 python bench.py --workload msm --k 24 --budget 5100 \
  > $L/s4_msm_sweep.json 2> $L/s4_msm_sweep.log
echo "stage4 rc=$? $(date -u)" >> $L/campaign.log

# Stage 5: NTT sweep to 2^24
timeout 3600 python bench.py --workload ntt --k 24 --budget 3300 \
  > $L/s5_ntt_sweep.json 2> $L/s5_ntt_sweep.log
echo "stage5 rc=$? $(date -u)" >> $L/campaign.log

# Stage 6: k=17 delay_enc (reference 7.4216 s)
DELAY_ENC_PROFILE=1 timeout 7000 python bench.py --workload delay_enc \
  --k 17 --repeats 2 --budget 6600 > $L/s6_delay_enc_k17.json 2> $L/s6_delay_enc_k17.log
echo "stage6 rc=$? $(date -u)" >> $L/campaign.log

echo "=== campaign done $(date -u) ===" >> $L/campaign.log
