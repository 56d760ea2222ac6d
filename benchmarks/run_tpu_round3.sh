#!/bin/bash
# Round-3 TPU measurement queue — run ONCE when the chip is healthy and the
# host is QUIET (no concurrent pytest/training: dispatch is CPU-sensitive).
# One process at a time; everything jitted; NO `timeout` wrappers (a SIGTERM
# mid-compile wedges the tunnel — round-1 AND round-3 incidents).
#
#   bash benchmarks/run_tpu_round3.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

stamp() { date +%H:%M:%S; }

echo "[$(stamp)] 1/4 headline bench (DDPM CIFAR-10, chain=2 default)"
python bench.py > "$OUT/bench_headline_round3.json" 2> "$OUT/bench_headline_round3.err"
echo "rc=$? $(cat "$OUT/bench_headline_round3.json")"

echo "[$(stamp)] 2/4 all-family sweep, chained K=8 (trainer auto path)"
python benchmarks/bench_all_families.py --iters 25 --chain 8 \
    --out "$OUT/results_round3.json" 2> "$OUT/sweep_round3.err"
echo "rc=$?"

echo "[$(stamp)] 3/4 AR families single-dispatch (for the wall docs)"
python benchmarks/bench_all_families.py --iters 25 \
    --families made,pixelcnn,tar \
    --out "$OUT/results_round3_ar_single.json" 2>> "$OUT/sweep_round3.err"
echo "rc=$?"

echo "[$(stamp)] 4/4 refresh per-family baseline table"
python benchmarks/derive_baselines.py > "$OUT/baseline_table_round3.md"
echo "[$(stamp)] done — artifacts in $OUT"
