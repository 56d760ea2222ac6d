#!/bin/bash
# Round-5 latent-DDPM gallery redo: the first cut (200-epoch latent DDPM
# over a 30-epoch VQ-VAE) scored 0.609/9/2.76 with the frozen first
# stage's recon MSE 0.198 bounding the ceiling.  This re-runs the chain
# with a properly trained first stage (100-epoch VQ-VAE) and a longer
# second stage (300 epochs), re-archiving benchmarks/real_runs/
# latent_ddpm_mnist + vqvae_mnist_r5.
#
#   bash benchmarks/run_round5_latent_redo.sh
#
# One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export IGM_SYNTHETIC_DATA=0

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
    echo "$rundir" > "/tmp/last_rundir_${name}"
  else
    echo "  FAILED rc=$rc (log: $dir/run.log)"
    tail -5 "$dir/run.log"
    exit 1
  fi
}

ckpt_of() { find "$(cat /tmp/last_rundir_$1)" -maxdepth 2 -type d \
    -name checkpoints | head -1; }

run_one vqvae_mnist_r5 vqvae/mnist 100
VQ_CK=$(ckpt_of vqvae_mnist_r5)
run_one latent_ddpm_mnist latent_ddpm/mnist 300 \
    trainer.check_val_every_n_epoch=50 "model.first_stage_ckpt=$VQ_CK"

python "$REPO/tools/score_gallery.py" --size 28
echo "[$(date +%H:%M:%S)] latent redo complete"
