#!/bin/bash
# Round-5 CFG payoff measurement (VERDICT #2): train the class-conditional
# DDPM and flow-matching models on the real digits, then quantify
# classifier-free guidance with tools/score_conditional.py at
# w in {0, 1, 2, 4} — conditional accuracy + per-class coverage into
# benchmarks/cfg_round5.json, galleries into benchmarks/real_runs/.
#
#   bash benchmarks/run_round5_cfg.sh
#
# One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export IGM_SYNTHETIC_DATA=0
OUT=$REPO/benchmarks/cfg_round5.json

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

# --- ddpm/cond_mnist -------------------------------------------------------
run_train DD_RD ddpm/cond_mnist 300 trainer.check_val_every_n_epoch=50
DD_CK=$(ckpt_of "$DD_RD")
python "$REPO/tools/archive_run.py" "$DD_RD" ddpm_cond_mnist

# per-class sample grid at the config guidance (80 = 10 classes x 8)
python "$REPO/tools/sample.py" experiment=ddpm/cond_mnist \
    --ckpt "$DD_CK" --n 80 --seed 7 \
    --out "$REPO/benchmarks/real_runs/ddpm_cond_mnist/samples_grid.jpg"

# --- flow/cond_mnist -------------------------------------------------------
run_train FL_RD flow/cond_mnist 300 trainer.check_val_every_n_epoch=50
FL_CK=$(ckpt_of "$FL_RD")
python "$REPO/tools/archive_run.py" "$FL_RD" flow_cond_mnist
python "$REPO/tools/sample.py" experiment=flow/cond_mnist \
    --ckpt "$FL_CK" --n 80 --seed 7 \
    --out "$REPO/benchmarks/real_runs/flow_cond_mnist/samples_grid.jpg"

# --- guidance sweeps -------------------------------------------------------
rm -f /tmp/cfg_rows.jsonl
for W in 0 1 2 4; do
  python "$REPO/tools/score_conditional.py" experiment=ddpm/cond_mnist \
      --ckpt "$DD_CK" --per-class 16 --guidance "$W" --seed 11 \
      >> /tmp/cfg_rows.jsonl
  python "$REPO/tools/score_conditional.py" experiment=flow/cond_mnist \
      --ckpt "$FL_CK" --per-class 16 --guidance "$W" --seed 11 \
      >> /tmp/cfg_rows.jsonl
done
python - <<'EOF'
import json
from pathlib import Path
rows = [json.loads(l) for l in Path("/tmp/cfg_rows.jsonl").read_text()
        .strip().splitlines()]
out = {"rows": rows}
Path("benchmarks/cfg_round5.json").write_text(json.dumps(out, indent=1))
print(f"wrote benchmarks/cfg_round5.json ({len(rows)} rows)")
EOF

# grids scored with the rest of the gallery
python "$REPO/tools/score_gallery.py" --size 28

echo "[$(date +%H:%M:%S)] CFG payoff sweep complete"
