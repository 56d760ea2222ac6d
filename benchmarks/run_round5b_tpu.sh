#!/bin/bash
# Round-5b TPU queue (run when the tunnel is healthy):
#   1) latent_ddpm gallery re-run over the GOOD 100-epoch first stage
#      (recon 0.0146) with latent_scale=auto (the LDM scale_factor fix —
#      the scale=1.0 run regressed coverage because the retrained
#      encoder's latent std is far from 1).
#   2) VQ-VAE EMA-codebook A/B: 30-epoch mnist_ema run, same budget as
#      the archived gradient-codebook run (vqvae_mnist_r5's first 30
#      epochs peaked commit ~91) -> benchmarks/real_runs/vqvae_mnist_ema.
#   Scoring runs on CPU (the on-TPU scorer wedged the tunnel once).
#
#   bash benchmarks/run_round5b_tpu.sh
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

VQ_CK=$(find "$(cat /tmp/last_rundir_vqvae_mnist_r5)" -maxdepth 2 -type d \
    -name checkpoints | head -1)
if [ -z "$VQ_CK" ]; then
  echo "no vqvae_mnist_r5 checkpoint on disk - train one first" >&2
  exit 1
fi

run_one latent_ddpm_mnist latent_ddpm/mnist 300 \
    trainer.check_val_every_n_epoch=50 "model.first_stage_ckpt=$VQ_CK"

run_one vqvae_mnist_ema vqvae/mnist_ema 30

IGM_PLATFORM=cpu JAX_PLATFORMS=cpu python "$REPO/tools/score_gallery.py" \
    --size 28
echo "[$(date +%H:%M:%S)] round-5b queue complete"
