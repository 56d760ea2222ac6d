#!/bin/bash
# Round-4 gallery additions/redos (VERDICT asks #1, #4, #8):
#   - consistency_mnist: NEW family gallery run (digit-score gated)
#   - ddpm_cifar:  REDO with the FID callback (metrics/fid_random trend in
#     summary.json) and with checkpointing ON so DDIM-50 vs DPM-20 sample
#     grids can be drawn from the SAME trained weights and quality-scored
#     with the 32x32 digit classifier (backing the "same quality class"
#     claim with a metric, not just sampler-agreement tests)
#   - edm_cifar:   NEW CIFAR-geometry EDM gallery run (same FID trend)
#
#   bash benchmarks/run_gallery_round4.sh [epochs_scale]
#
# One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export IGM_SYNTHETIC_DATA=0

FID_CB=+callbacks.eval_fid._target_=igm_tpu.callbacks.evaluation.FIDEvaluationCallback

run_one() {  # run_one <name> <experiment> <epochs> [extra overrides...]
  local name=$1 exp=$2 epochs=$3; shift 3
  echo "[$(date +%H:%M:%S)] $name (experiment=$exp, $epochs epochs)"
  local dir
  dir=$(mktemp -d)
  (cd "$dir" && python "$REPO/run.py" "experiment=$exp" \
      "data_dir=$REPO/data" "trainer.max_epochs=$epochs" \
      trainer.log_every_n_steps=5 print_config=False seed=3 "$@") \
      > "$dir/run.log" 2>&1
  local rc=$?
  local rundir
  rundir=$(dirname "$(find "$dir/logs" -name tensorboard -type d | head -1)")
  if [ $rc -eq 0 ] && [ -n "$rundir" ]; then
    python "$REPO/tools/archive_run.py" "$rundir" "$name"
    echo "  archived -> benchmarks/real_runs/$name"
    echo "$rundir" > "/tmp/last_rundir_$name"
  else
    echo "  FAILED rc=$rc (log: $dir/run.log)"
    tail -5 "$dir/run.log"
  fi
}

S=${1:-1}

run_one consistency_mnist consistency/mnist $((60*S)) \
    trainer.check_val_every_n_epoch=10

run_one ddpm_cifar ddpm/cifar10 $((30*S)) \
    trainer.check_val_every_n_epoch=5 "$FID_CB"

run_one edm_cifar edm/cifar10 $((30*S)) \
    trainer.check_val_every_n_epoch=5 "$FID_CB"

# DDIM-50 vs DPM-20 grids from the SAME ddpm_cifar weights
if [ -f /tmp/last_rundir_ddpm_cifar ]; then
  RD=$(cat /tmp/last_rundir_ddpm_cifar)
  CK=$(find "$RD" -maxdepth 2 -type d -name checkpoints | head -1)
  if [ -n "$CK" ]; then
    python "$REPO/tools/sample.py" experiment=ddpm/cifar10 \
        --ckpt "$CK" --n 64 --sampler ddim --seed 11 \
        --out "$REPO/benchmarks/real_runs/ddpm_cifar/samples_ddim50.jpg"
    python "$REPO/tools/sample.py" experiment=ddpm/cifar10 \
        --ckpt "$CK" --n 64 --sampler dpm --seed 11 \
        --out "$REPO/benchmarks/real_runs/ddpm_cifar/samples_dpm20.jpg"
  else
    echo "no checkpoint dir under $RD"
  fi
fi

echo "[$(date +%H:%M:%S)] round-4 gallery complete"
