#!/bin/bash
# Run the round-3 training-perf measurement queue on the real chip, each
# stage logged to /tmp/perf_suite/. Stages are independent: a failure moves
# on to the next. Usage: bash scripts/run_tpu_perf_suite.sh [outdir]
set -u
OUT=${1:-/tmp/perf_suite}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T))"
  timeout 1200 "$@" >"$OUT/$name.log" 2>&1
  echo "    exit=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

run roofline_tts      python scripts/roofline_train_step.py --iters 20
run ablate_b0         python scripts/ablate_train_step.py --bucket 0 --iters 15
run ablate_b2         python scripts/ablate_train_step.py --bucket 2 --iters 15
run remat_ab          python scripts/bench_remat_train_step.py --iters 15
run profile_b0        python scripts/profile_train_step.py --bucket 0 --iters 10 --dump "$OUT/profile_b0.tsv"
run aligner_step      python scripts/measure_train_step.py --model aligner --r 1 --iters 20
run roofline_aligner  python scripts/roofline_train_step.py --model aligner --iters 20
run bench             python bench.py
echo "=== all done ($(date +%T)); logs in $OUT"
