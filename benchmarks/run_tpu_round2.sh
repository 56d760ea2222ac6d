#!/bin/bash
# Round-2 TPU measurement queue — run ONCE when the chip is healthy.
# One process at a time (NOTES.md: concurrent benches queue and look hung);
# everything jitted; generous timeouts; persistent compile cache.
#
#   bash benchmarks/run_tpu_round2.sh [outdir]
#
# Produces: headline bench JSON, all-family sweep JSON, and a DDPM
# real-data training curve, all under benchmarks/ (committed afterwards).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

stamp() { date +%H:%M:%S; }

echo "[$(stamp)] 1/4 headline bench (DDPM CIFAR-10 train step)"
python bench.py > "$OUT/bench_headline_round2.json" 2> "$OUT/bench_headline_round2.err"
echo "rc=$? $(cat "$OUT/bench_headline_round2.json")"

echo "[$(stamp)] 2/4 all-family sweep"
python benchmarks/bench_all_families.py --iters 50 \
    --out "$OUT/results_round2.json" 2> "$OUT/sweep_round2.err"
echo "rc=$?"

echo "[$(stamp)] 3/4 sampling bench (ancestral + ddim)"
python benchmarks/bench_sampling.py > "$OUT/sampling_round2.json" 2>/dev/null
echo "rc=$? $(cat "$OUT/sampling_round2.json" 2>/dev/null | head -2)"

echo "[$(stamp)] 3.5/4 headline batch scan (MFU vs batch)"
for B in 128 256 512 1024; do
  IGM_BENCH_BATCH=$B python bench.py 2>/dev/null
done | tee "$OUT/batch_scan_round2.jsonl"

echo "[$(stamp)] 4/4 real-data DDPM training (digit-CIFAR, FID-wired)"
RUN_DIR=$(mktemp -d)
(cd "$RUN_DIR" && IGM_SYNTHETIC_DATA=0 python "$OLDPWD/run.py" \
    experiment=ddpm/cifar10 data_dir="$OLDPWD/data" \
    trainer.max_epochs=30 trainer.check_val_every_n_epoch=5 \
    print_config=False) 2>&1 | tail -4
cp -r "$RUN_DIR"/logs/runs/ddpm/cifar10/results "$OUT/real_ddpm_results" 2>/dev/null
cp -r "$RUN_DIR"/logs/runs/ddpm/cifar10/tensorboard "$OUT/real_ddpm_tb" 2>/dev/null
echo "[$(stamp)] done — artifacts in $OUT"
