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

echo "[$(stamp)] 1/6 headline bench (DDPM CIFAR-10, auto chain policy)"
python bench.py > "$OUT/bench_headline_round3.json" 2> "$OUT/bench_headline_round3.err"
echo "rc=$? $(cat "$OUT/bench_headline_round3.json")"

echo "[$(stamp)] 2/6 all-family sweep, chained K=8 (trainer auto path)"
python benchmarks/bench_all_families.py --iters 25 --chain 8 \
    --out "$OUT/results_round3.json" 2> "$OUT/sweep_round3.err"
echo "rc=$?"

echo "[$(stamp)] 3/6 AR families single-dispatch (for the wall docs)"
python benchmarks/bench_all_families.py --iters 25 \
    --families made,pixelcnn,tar \
    --out "$OUT/results_round3_ar_single.json" 2>> "$OUT/sweep_round3.err"
echo "rc=$?"

echo "[$(stamp)] 4/6 refresh per-family baseline table"
python benchmarks/derive_baselines.py > "$OUT/baseline_table_round3.md"

echo "[$(stamp)] 5/6 sampling bench (ancestral + DDIM-50)"
python benchmarks/bench_sampling.py > "$OUT/sampling_round3.json" 2>/dev/null
echo "rc=$?"

echo "[$(stamp)] 6/7 MADE batch-scaling lever"
python benchmarks/made_batch_scaling.py > "$OUT/made_batch_scaling.jsonl" 2>/dev/null
echo "rc=$?"

echo "[$(stamp)] 7/7 AR sampling throughput (made/pixelcnn/tar)"
python benchmarks/bench_ar_sampling.py > "$OUT/ar_sampling_round3.jsonl" 2>/dev/null
echo "rc=$?"
echo "[$(stamp)] done — artifacts in $OUT"
