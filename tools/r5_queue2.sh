#!/bin/bash
# Round-5 second TPU queue. Runs AFTER r5_queue1 decisions land:
#
# 1. Trained-golden fidelity matrix at n,m on the TPU (VERDICT item 4):
#    overfit-trains yolo11m (fast on chip), exports through the inverse
#    converter, runs the planted-GT protocol — the m floor row.
# 2. int8 eligibility-threshold A/B at x/b128 (C=96 convs: quantize or
#    not?) + n@1280 re-check with the reciprocal-requant epilogue
#    (VERDICT item 3 targets: x/b128 >= 1.9x, n@1280 >= 1.0x).
# 3. Exported-artifact b1 latency row (VERDICT item 9).
# 4. m/b32 seldec validation (if n/b32 A/B won in queue 1).
# 5. Final full driver bench (warm cache + headline with flipped defaults).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tools/tpu_retry.sh /tmp/r5_trained_golden.log python tools/accuracy_matrix.py \
  --trained --sizes n,m --out /tmp/r5_trained_golden.json
echo "PHASE1 trained_golden done $(date +%H:%M:%S)" >> /tmp/r5_queue2.status

SIZES=x BATCHES=128 RUNS=8 MIN_CHANNELS=96 \
  tools/tpu_retry.sh /tmp/r5_int8_x96.log python tools/bench_quant_e2e.py
SIZES=n BATCHES=32 IMGSZ=1280 RUNS=10 \
  tools/tpu_retry.sh /tmp/r5_int8_n1280.log python tools/bench_quant_e2e.py
echo "PHASE2 int8 done $(date +%H:%M:%S)" >> /tmp/r5_queue2.status

SIZE=n RUNS=100 BATCH=1 \
  tools/tpu_retry.sh /tmp/r5_exported_b1.log python tools/bench_exported_b1.py
echo "PHASE3 exported_b1 done $(date +%H:%M:%S)" >> /tmp/r5_queue2.status

CONFIGS="m:32" RUNS=20 VARIANTS=default,seldec_off \
  tools/tpu_retry.sh /tmp/r5_m_seldec.log python tools/bench_chunk_tile_matrix.py
echo "PHASE4 m_seldec done $(date +%H:%M:%S)" >> /tmp/r5_queue2.status

tools/tpu_retry.sh /tmp/r5_bench.log python bench.py
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> /tmp/r5_queue2.status
