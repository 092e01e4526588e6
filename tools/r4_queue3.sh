#!/bin/bash
# Round-4 third TPU queue (sequential, wedge-tolerant). Most-valuable first:
#
# 1. Full driver bench (verify the 9.74 ms / 3285 img/s headline reproduces
#    and warm the remote compile cache so the driver's end-of-round run is
#    fast and weather-proof).
# 2. b64 chunk-policy cells the size-gate left unmeasured: the policy chunks
#    m/l/x at every 32<=B<128, B%16==0, but b64 was measured at n only
#    ("always matrix the dial" — CLAUDE.md round-4 lesson).
# 3. n@b96 (three b16 chunks + a 6-chunk scan-collapse check is NOT needed:
#    policy already unrolls >2 chunks; this validates the unroll at 6 chunks).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

tools/tpu_retry.sh /tmp/r4_bench.log python bench.py

CONFIGS="m:64,l:64,x:64" RUNS=15 VARIANTS=default,chunk_off \
  tools/tpu_retry.sh /tmp/r4_b64matrix.log python tools/bench_chunk_tile_matrix.py

CONFIGS="n:96" RUNS=20 VARIANTS=default,chunk_off \
  tools/tpu_retry.sh /tmp/r4_n96.log python tools/bench_chunk_tile_matrix.py

echo "QUEUE3 DONE $(date +%H:%M:%S)" >> /tmp/r4_queue3.status
