#!/bin/bash
# Round-5 first TPU queue (sequential, wedge-tolerant). Most-valuable first:
#
# 1. Detect-tail A/B at n/b32 (the headline regime): select-then-decode
#    (seldec), halved candidate pool (k256), and stacked — VERDICT r4 item 1.
# 2. Val-program chunk A/B at b16/b32/b64 — VERDICT r4 item 2 (b32 val ran
#    WORSE per image than b16; same lane-starvation signature _serve_chunk
#    fixes for predict).
# 3. Unmeasured chunk-policy cells b48/80/112 (detect, n/m) — VERDICT item 5.
# 4. Non-detect n/b64 cells (pose/segment/obb/classify).
# 5. s/l serving-row refresh on the round-5 pipeline + the s-dedicated
#    chunk re-check post tail-rewrite.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

CONFIGS="n:32" RUNS=30 VARIANTS=default,seldec,k256,seldec_k256 \
  tools/tpu_retry.sh /tmp/r5_tail_ab.log python tools/bench_chunk_tile_matrix.py
echo "PHASE1 tail_ab done $(date +%H:%M:%S)" >> /tmp/r5_queue1.status

SIZE=n BATCHES=16,32,64 VARIANTS=default,chunk_off RUNS=15 \
  tools/tpu_retry.sh /tmp/r5_val_ab.log python tools/bench_val_loop.py
echo "PHASE2 val_ab done $(date +%H:%M:%S)" >> /tmp/r5_queue1.status

CONFIGS="n:48,n:80,n:112,m:48,m:80,m:112" RUNS=10 VARIANTS=default,chunk16_unroll \
  tools/tpu_retry.sh /tmp/r5_oddcells.log python tools/bench_chunk_tile_matrix.py
echo "PHASE3 oddcells done $(date +%H:%M:%S)" >> /tmp/r5_queue1.status

for T in pose segment obb classify; do
  TASK=$T CONFIGS="n:64" RUNS=15 VARIANTS=default,chunk16_unroll \
    tools/tpu_retry.sh /tmp/r5_nondetect_b64.log python tools/bench_chunk_tile_matrix.py
done
echo "PHASE4 nondetect_b64 done $(date +%H:%M:%S)" >> /tmp/r5_queue1.status

CONFIGS="s:32,l:32" RUNS=20 VARIANTS=default,chunk16_unroll,seldec \
  tools/tpu_retry.sh /tmp/r5_sl_refresh.log python tools/bench_chunk_tile_matrix.py
echo "QUEUE1 DONE $(date +%H:%M:%S)" >> /tmp/r5_queue1.status
