#!/bin/bash
# Real-data gallery: short training runs per model family on the packaged
# real-digit datasets, archiving sample grids + full scalar curves into
# benchmarks/real_runs/<family>/ — the counterpart of the reference's
# published per-model sample grids (/root/reference/readme.adoc:97-449).
#
#   bash benchmarks/run_real_gallery.sh [epochs_scale]
#
# One TPU process at a time (NOTES.md); safe to run on CPU with
# IGM_PLATFORM=cpu for smoke purposes.
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
  else
    echo "  FAILED rc=$rc (log: $dir/run.log)"
    tail -5 "$dir/run.log"
  fi
}

S=${1:-1}  # epoch scale factor

run_one vae_mnist        vae/mnist_conv   $((30*S))
run_one cvae_mnist       cvae/mnist       $((30*S))
run_one vqvae_mnist      vqvae/mnist      $((30*S))
run_one lsgan_mnist      lsgan/conv_mnist $((40*S))
run_one wgan_gp_mnist    wgan_gp/mnist_conv $((40*S))
run_one infogan_mnist    infogan/mnist    $((40*S))
run_one aae_mnist        aae/mnist        $((30*S))
run_one bigan_mnist      bigan/mnist      $((40*S))
run_one age_mnist        age/mnist        $((30*S))
run_one vaegan_mnist     vaegan/mnist     $((40*S))
run_one factor_vae_dsprites factor_vae/dsprites $((20*S))
run_one beta_vae_dsprites   beta_vae/dsprites   $((20*S))
run_one made_mnist       made/mnist       $((25*S))
run_one pixelcnn_mnist   pixelcnn/mnist   $((25*S))
run_one tar_mnist        tar/mnist        $((25*S))
# RGB diffusion runs carry the FID callback explicitly (the reference's
# ddpm config drops it via /callbacks: ar_models — parity) so the degraded
# fid_random backend leaves a monotone quality trace in summary.json
FID_CB=+callbacks.eval_fid._target_=igm_tpu.callbacks.evaluation.FIDEvaluationCallback
run_one ddpm_cifar       ddpm/cifar10     $((30*S)) trainer.check_val_every_n_epoch=5 "$FID_CB"
run_one ddpm_celeba      ddpm/celeba      $((30*S)) trainer.check_val_every_n_epoch=10 "$FID_CB"
run_one flow_mnist       flow/mnist       $((30*S)) trainer.check_val_every_n_epoch=5
run_one realnvp_mnist    realnvp/mnist    $((25*S)) trainer.check_val_every_n_epoch=5
# DiT backbone + DPM-Solver validation sampling in one run (round 3)
run_one ddpm_cifar_dit   ddpm/cifar10_dit $((30*S)) \
    trainer.check_val_every_n_epoch=5 +model.val_sampler=dpm "$FID_CB"
# modern recipe: v-prediction + min-SNR + EMA + DPM val sampler (round 3c)
run_one ddpm_cifar_dit_v ddpm/cifar10_dit_v $((30*S)) \
    trainer.check_val_every_n_epoch=5 "$FID_CB"
# EDM sigma-space diffusion + 18-step Heun sampling (round 3c)
run_one edm_mnist        edm/mnist        $((30*S)) \
    trainer.check_val_every_n_epoch=5
# consistency training (iCT): 2-step multistep sampling (round 4)
run_one consistency_mnist consistency/mnist $((60*S)) \
    trainer.check_val_every_n_epoch=10
# VE score-SDE + Predictor-Corrector sampling (round 4b)
run_one score_sde_mnist  score_sde/mnist  $((30*S)) \
    trainer.check_val_every_n_epoch=5

echo "[$(date +%H:%M:%S)] gallery complete"
