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

# 4. Causal flash kernel: on-chip correctness + timing vs XLA.
# (serving + streaming benches now run inside bench.py extras, step 1.)
timeout 1200 python scripts_dev/causal_tpu_probe.py \
  2>&1 | tee /tmp/tpu_session/causal.txt

# 5. Cold-start pair: prime the compile cache, then measure a fresh
# process's wall-to-first-batch with the primed cache (VERDICT r3 #6).
rm -rf /tmp/mm_s2ut_cold_cache
timeout 3600 python scripts_dev/cold_start_probe.py prime \
  2>&1 | tee /tmp/tpu_session/cold_prime.txt
timeout 1800 python scripts_dev/cold_start_probe.py cold \
  2>&1 | tee /tmp/tpu_session/cold.txt

echo DONE
