#!/bin/bash
# TPU measurement queue: run everything worth measuring in one session,
# logging JSON lines to /tmp/tpu_session/. Run when the axon chip claims.
set -x
mkdir -p /tmp/tpu_session
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. Headline bench (beam 10 B=128 int8 + extras incl. train MFU).
timeout 3600 python bench.py 2>/tmp/tpu_session/bench.log \
  | tee /tmp/tpu_session/bench.json

# 2. Stage split at the headline operating point.
PROBE_B=128 PROBE_BEAM=10 PROBE_KV=int8 timeout 2400 \
  python scripts_dev/stage_times.py 2>&1 | tee /tmp/tpu_session/stages.txt

# 3. B=256 probe (skip extras; one operating point).
MM_BENCH_BATCH=256 MM_BENCH_SKIP_EXTRAS=1 timeout 3600 python bench.py \
  2>/tmp/tpu_session/bench256.log | tee /tmp/tpu_session/bench256.json

# 4. Serving vs static on a mixed-length workload.
SRV_SLOTS=64 timeout 5400 python benchmarks/bench_serving.py \
  2>/tmp/tpu_session/serving.log | tee /tmp/tpu_session/serving.json

# 5. Causal flash kernel: on-chip correctness + timing vs XLA.
timeout 1200 python scripts_dev/causal_tpu_probe.py \
  2>&1 | tee /tmp/tpu_session/causal.txt

# 6. Streaming S2ST per-chunk latency.
timeout 2400 python benchmarks/bench_streaming.py \
  2>/tmp/tpu_session/stream.log | tee /tmp/tpu_session/stream.json

echo DONE
