#!/bin/bash
# Round-5 gallery additions (VERDICT #3, #4, #5):
#   - ddpm_cifar RETRAIN (60 epochs, ckpt kept) feeding the DDIM root-cause
#     sweep (benchmarks/ddim_sweep.py) + post-fix DDIM-50/DPM-20 grids
#   - latent_ddpm_mnist: vqvae/mnist first stage -> latent DDPM gallery
#   - score_sde_vp_mnist: the VP arm's first scored grid
#   - moe_dit_mnist: MoE-DiT learning evidence (routing-health curves ride
#     the archived TB scalars: moe/load_entropy, moe/min_share)
#
#   bash benchmarks/run_round5_galleries.sh [epochs_scale]
#
# One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export IGM_SYNTHETIC_DATA=0
S=${1:-1}

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
    echo "$rundir" > "/tmp/last_rundir_${name}"
  else
    echo "  FAILED rc=$rc (log: $dir/run.log)"
    tail -5 "$dir/run.log"
  fi
}

ckpt_of() { find "$(cat /tmp/last_rundir_$1)" -maxdepth 2 -type d \
    -name checkpoints | head -1; }

# --- ddpm_cifar retrain (longer: 60 epochs vs round-4's 30) ---------------
run_one ddpm_cifar ddpm/cifar10 $((60*S)) \
    trainer.check_val_every_n_epoch=10 "$FID_CB"
CK=$(ckpt_of ddpm_cifar)
if [ -n "$CK" ]; then
  # post-fix fast-sampler grids from the SAME weights, same seed as round 4
  python "$REPO/tools/sample.py" experiment=ddpm/cifar10 \
      --ckpt "$CK" --n 64 --sampler ddim --seed 11 \
      --out "$REPO/benchmarks/real_runs/ddpm_cifar/samples_ddim50.jpg"
  python "$REPO/tools/sample.py" experiment=ddpm/cifar10 \
      --ckpt "$CK" --n 64 --sampler dpm --seed 11 \
      --out "$REPO/benchmarks/real_runs/ddpm_cifar/samples_dpm20.jpg"
  # the root-cause sweep: clip {consistent,stale,none} x steps x eta
  python "$REPO/benchmarks/ddim_sweep.py" --ckpt "$CK" --n 64 --seed 11 \
      --out "$REPO/benchmarks/ddim_sweep_round5.json"
fi

# --- latent diffusion chain ------------------------------------------------
run_one vqvae_mnist_r5 vqvae/mnist $((30*S))
VQ_CK=$(ckpt_of vqvae_mnist_r5)
if [ -n "$VQ_CK" ]; then
  run_one latent_ddpm_mnist latent_ddpm/mnist $((200*S)) \
      trainer.check_val_every_n_epoch=25 "model.first_stage_ckpt=$VQ_CK"
fi

# --- VP score-SDE gallery (VE arm needed ~400 epochs to converge) ----------
run_one score_sde_vp_mnist score_sde/mnist_vp $((400*S)) \
    trainer.check_val_every_n_epoch=50

# --- MoE-DiT learning run ---------------------------------------------------
run_one moe_dit_mnist ddpm/mnist $((300*S)) \
    trainer.check_val_every_n_epoch=50 \
    model.network=dit model.hidden_dim=256 +model.depth=6 +model.heads=4 \
    +model.patch=4 +model.moe_experts=8 +model.moe_every=2 \
    model.ema_decay=0.999 model.loss_type=l2 +model.val_sampler=dpm

# score all MNIST-geometry grids (28) and the CIFAR-geometry ones (32)
python "$REPO/tools/score_gallery.py" --size 28
python "$REPO/tools/score_gallery.py" --size 32

echo "[$(date +%H:%M:%S)] round-5 galleries complete"
