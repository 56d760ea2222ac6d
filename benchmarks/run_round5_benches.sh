#!/bin/bash
# Round-5 on-chip bench refresh (VERDICT #1 bench legs, #3 fixed-DDIM row,
# #4 latent_ddpm re-measure, #8 AR-row re-fence):
#   - sampler zoo (now incl. the distilled 8/4-step students and the
#     clip-consistent DDIM) -> sampling_round5.jsonl
#   - AR samplers re-measured with the device_get fence -> ar_sampling_round5
#   - beyond-parity train rows re-measured post qkv/fence fixes ->
#     new_families_round5.jsonl
# then perf_table.py --write re-renders every doc table.
#
#   bash benchmarks/run_round5_benches.sh
#
# One TPU process at a time (NOTES.md) — strictly serialized below.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

echo "[$(date +%H:%M:%S)] sampler zoo"
python "$REPO/benchmarks/bench_sampling.py" \
    > "$REPO/benchmarks/sampling_round5.jsonl" \
    2> "$REPO/benchmarks/sampling_round5.err" || tail -3 \
    "$REPO/benchmarks/sampling_round5.err"

echo "[$(date +%H:%M:%S)] AR samplers"
python "$REPO/benchmarks/bench_ar_sampling.py" \
    > "$REPO/benchmarks/ar_sampling_round5.jsonl" \
    2> "$REPO/benchmarks/ar_sampling_round5.err" || tail -3 \
    "$REPO/benchmarks/ar_sampling_round5.err"

echo "[$(date +%H:%M:%S)] beyond-parity train rows"
python "$REPO/benchmarks/bench_new_families.py" \
    > "$REPO/benchmarks/new_families_round5.jsonl" \
    2> "$REPO/benchmarks/new_families_round5.err" || tail -3 \
    "$REPO/benchmarks/new_families_round5.err"

python "$REPO/tools/perf_table.py" --write
echo "[$(date +%H:%M:%S)] benches complete"
