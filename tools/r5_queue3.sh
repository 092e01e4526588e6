#!/bin/bash
# Round-5 third TPU queue: retries + follow-ups from queue 2.
#
# 1. Trained-golden fidelity matrix (n, m) — the imgsz-plumbing fix landed;
#    this is the VERDICT item-4 floor row.
# 2. m/b32 seldec ablation (queue-2 attempt died on a tunnel
#    FAILED_PRECONDITION; retry pattern widened).
# 3. int8 x chunking interplay at n/640 and n/1280 — the quantized gate in
#    _serve_chunk was conservative; at 1280 the bf16 base now chunks (+38%)
#    while int8 cannot, reading as int8 0.76x. Does forced chunk-16 fix it?
# 4. Exported-artifact b1 rerun WITH a live-predictor control in-process
#    (queue-2 row read 6.5 ms vs the live 1.6 — artifact overhead or
#    protocol?); plus a seldec-off export A/B via env.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tools/tpu_retry.sh /tmp/r5_trained_golden2.log python tools/accuracy_matrix.py \
  --trained --sizes n,m --out /tmp/r5_trained_golden.json
echo "PHASE1 trained_golden done $(date +%H:%M:%S)" >> /tmp/r5_queue3.status

CONFIGS="m:32" RUNS=20 VARIANTS=default,seldec_off \
  tools/tpu_retry.sh /tmp/r5_m_seldec2.log python tools/bench_chunk_tile_matrix.py
echo "PHASE2 m_seldec done $(date +%H:%M:%S)" >> /tmp/r5_queue3.status

SIZE=n BATCH=32 IMGSZ=640 RUNS=30 VARIANTS=whole,chunk16_unroll \
  tools/tpu_retry.sh /tmp/r5_int8_chunk640.log python tools/bench_int8_chunk.py
SIZE=n BATCH=32 IMGSZ=1280 RUNS=15 VARIANTS=whole,chunk16_unroll \
  tools/tpu_retry.sh /tmp/r5_int8_chunk1280.log python tools/bench_int8_chunk.py
echo "PHASE3 int8_chunk done $(date +%H:%M:%S)" >> /tmp/r5_queue3.status

SIZE=n RUNS=100 BATCH=1 \
  tools/tpu_retry.sh /tmp/r5_exported_b1b.log python tools/bench_exported_b1.py
YOLO_TPU_DETECT_SELDEC=0 SIZE=n RUNS=100 BATCH=1 \
  tools/tpu_retry.sh /tmp/r5_exported_b1c.log python tools/bench_exported_b1.py
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> /tmp/r5_queue3.status
