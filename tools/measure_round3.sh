#!/bin/bash
# One-shot round-3 TPU measurement session (run when the tunnel is up).
# Each step appends its JSON to /tmp/round3_measurements.jsonl so a
# dropped tunnel mid-session loses nothing. Run steps individually if
# preferred; they are independent. ~25 min total warm.
set -x
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/round3_measurements.jsonl}

# 1. driver headline (median-of-3 passes + link probes inside)
timeout 1200 python bench.py | tee -a "$OUT"

# 2. warm-TTF + 60 s clean soak, real 24-layer HuBERT
SOAK_SECONDS=60 SOAK_OUT=/tmp/soak60.json timeout 900 \
  python tools/soak_streaming.py && cat /tmp/soak60.json >> "$OUT"

# 3. 10-min fault-injected soak (drift + RSS bound, injected failures)
SOAK_SECONDS=600 SOAK_FAULTS=1 SOAK_OUT=/tmp/soak600.json timeout 1500 \
  python tools/soak_streaming.py && cat /tmp/soak600.json >> "$OUT"

# 4. preprocess stride A/B (detect_stride 1 vs 4, interleaved)
PRE_AB=1 PRE_STRIDE_AB=1 timeout 1200 python tools/bench_preprocess.py \
  | tee -a "$OUT"

# 5. multi-stream capacity (target >=25 realtime streams/chip)
timeout 1200 python tools/bench_multistream.py | tee -a "$OUT"

# 6. training throughput (resident, fp32 vs bf16)
timeout 1200 python tools/bench_train.py | tee -a "$OUT"
TRAIN_DTYPE=bfloat16 timeout 1200 python tools/bench_train.py | tee -a "$OUT"

# 7. offline file-to-file A/B (sequential vs pipelined manager)
timeout 1500 python tools/bench_offline.py | tee -a "$OUT"
