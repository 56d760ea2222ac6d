#!/bin/bash
# Round-5 progressive-distillation chain on the real digits (VERDICT #1):
#   teacher ddpm/mnist (v-param, T=256, EMA) -> phase 1 (16-step DDIM
#   teacher -> 8-step student) -> phase 2 (8 -> 4-step student), then
#   teacher/student sample grids + curves archived into
#   benchmarks/real_runs/distill_mnist/ for the digit-score gate.
#
#   bash benchmarks/run_round5_distill.sh [teacher_rundir]
#
# If teacher_rundir (a hydra run dir with checkpoints/) is given, the
# teacher training step is skipped.  One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export IGM_SYNTHETIC_DATA=0

DEST=$REPO/benchmarks/real_runs/distill_mnist
mkdir -p "$DEST"

# teacher arch/schedule knobs — MUST match configs/experiment/distill/mnist
TEACH_OV=("model.dim_mults=[1,2]" model.timesteps=256
          model.parameterization=v model.loss_type=l2
          model.ema_decay=0.999 model.val_sampler=ddim model.ddim_steps=16)

run_train() {  # run_train <outvar> <experiment> <epochs> [overrides...]
  local outvar=$1 exp=$2 epochs=$3; shift 3
  local dir
  dir=$(mktemp -d)
  echo "[$(date +%H:%M:%S)] train $exp ($epochs epochs) -> $dir"
  (cd "$dir" && python "$REPO/run.py" "experiment=$exp" \
      "data_dir=$REPO/data" "trainer.max_epochs=$epochs" \
      trainer.log_every_n_steps=5 print_config=False seed=3 "$@") \
      > "$dir/run.log" 2>&1 || { echo "FAILED (log: $dir/run.log)";
                                 tail -5 "$dir/run.log"; exit 1; }
  local rundir
  rundir=$(dirname "$(find "$dir/logs" -name tensorboard -type d | head -1)")
  eval "$outvar=$rundir"
}

ckpt_of() { find "$1" -maxdepth 2 -type d -name checkpoints | head -1; }

if [ $# -ge 1 ] && [ -n "$1" ]; then
  TEACHER_RD=$1
else
  run_train TEACHER_RD ddpm/mnist 300 trainer.check_val_every_n_epoch=50 \
      "${TEACH_OV[@]}"
fi
TEACHER_CK=$(ckpt_of "$TEACHER_RD")
echo "teacher ckpt: $TEACHER_CK"

# phase 1: DDIM-16 teacher -> 8-step student
run_train P1_RD distill/mnist 400 trainer.check_val_every_n_epoch=100 \
    "model.teacher_ckpt=$TEACHER_CK" model.student_steps=8
P1_CK=$(ckpt_of "$P1_RD")
echo "phase-1 ckpt: $P1_CK"

# phase 2: 8-step student becomes the teacher -> 4-step student
run_train P2_RD distill/mnist 400 trainer.check_val_every_n_epoch=100 \
    "model.teacher_ckpt=$P1_CK" model.student_steps=4 exp_name=distill/mnist_p2
P2_CK=$(ckpt_of "$P2_RD")
echo "phase-2 ckpt: $P2_CK"

# archive curves (phase 1 is the family's canonical curve set; phase 2
# curves ride alongside)
python "$REPO/tools/archive_run.py" "$P1_RD" distill_mnist
python - "$P2_RD" "$DEST" <<'EOF'
import json, sys
from pathlib import Path
sys.path.insert(0, "tools")
from archive_run import read_scalars
curves = read_scalars(Path(sys.argv[1]) / "tensorboard")
dest = Path(sys.argv[2])
(dest / "curves_phase2.json").write_text(json.dumps(curves, indent=0))
summary = json.loads((dest / "summary.json").read_text())
summary["phase2"] = {tag: {"first": pts[0], "last": pts[-1]}
                     for tag, pts in curves.items() if pts}
(dest / "summary.json").write_text(json.dumps(summary, indent=1))
EOF

# sample grids, all from the same seed: the teacher's own DDIM-16 chain,
# the 8-step phase-1 student, the 4-step phase-2 student
python "$REPO/tools/sample.py" experiment=ddpm/mnist "${TEACH_OV[@]}" \
    --ckpt "$TEACHER_CK" --n 64 --sampler ddim --steps 16 --seed 7 \
    --out "$DEST/samples_teacher_ddim16.jpg"
python "$REPO/tools/sample.py" experiment=distill/mnist \
    "model.teacher_ckpt=null" model.student_steps=8 \
    --ckpt "$P1_CK" --n 64 --seed 7 \
    --out "$DEST/samples_student8.jpg"
python "$REPO/tools/sample.py" experiment=distill/mnist \
    "model.teacher_ckpt=null" model.student_steps=4 \
    --ckpt "$P2_CK" --n 64 --seed 7 \
    --out "$DEST/samples_student4.jpg"

# score every grid at 28x28 (writes digit_scores.json per family)
python "$REPO/tools/score_gallery.py" --size 28

echo "[$(date +%H:%M:%S)] distill chain complete -> $DEST"
