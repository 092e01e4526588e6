#!/bin/bash
# Round-4 second TPU measurement queue (sequential, one client at a time,
# wedge-tolerant). Steps ordered most-valuable-first; each appends rows
# incrementally to its own log under /tmp.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. device-op attribution of the 9.74 ms headline (what's left to attack)
SIZE=n BATCH=32 RUNS=30 TRACE_DIR=/tmp/trace_b32_r4 TOP=40 \
  tools/tpu_retry.sh /tmp/r4_trace.log python tools/trace_ops.py

# 2. int8 x chunk interplay (policy gates chunking off when quantized — unmeasured)
SIZE=n BATCH=32 IMGSZ=640 RUNS=30 \
  tools/tpu_retry.sh /tmp/r4_int8chunk.log python tools/bench_int8_chunk.py

# 3. imgsz-matrix cells the n-only gate left unmeasured: m@1280 (policy chunks), s@1280 (policy whole)
IMGSZ=1280 CONFIGS="m:32" RUNS=15 VARIANTS=default,chunk_off \
  tools/tpu_retry.sh /tmp/r4_m1280.log python tools/bench_chunk_tile_matrix.py
IMGSZ=1280 CONFIGS="s:32" RUNS=15 VARIANTS=default,chunk16_unroll \
  tools/tpu_retry.sh /tmp/r4_s1280.log python tools/bench_chunk_tile_matrix.py

# 4. m@320 (policy whole below 640 — measured only at n)
IMGSZ=320 CONFIGS="m:32" RUNS=30 VARIANTS=default,chunk16_unroll \
  tools/tpu_retry.sh /tmp/r4_m320.log python tools/bench_chunk_tile_matrix.py

echo "QUEUE DONE $(date +%H:%M:%S)" >> /tmp/r4_queue2.status
