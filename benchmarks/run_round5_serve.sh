#!/bin/bash
# Round-5 serving-latency record (VERDICT #6): export the two
# serving-relevant samplers (consistency 1-step — the fastest sampler in
# the zoo — and DDPM DPM-Solver++-20) at request batch 1 and 64, then
# measure p50/p95/p99 through tools/serve.py's full HTTP stack on-chip.
#
#   bash benchmarks/run_round5_serve.sh [ddpm_ckpt_dir]
#
# If a ddpm_cifar checkpoint dir is given the DPM-20 artifact carries
# trained weights; otherwise init weights (identical FLOPs -> identical
# latency; the row records which).  One TPU process at a time (NOTES.md).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DD_CK=${1:-}

rm -f /tmp/serve_rows.jsonl
row() {  # row <name> <artifact> <weights>
  local name=$1 art=$2 weights=$3
  echo "[$(date +%H:%M:%S)] bench $name"
  local stats
  stats=$(python "$REPO/tools/serve.py" "$art" --bench 100) || return 1
  python - "$name" "$weights" "$stats" <<'EOF'
import json, sys
row = {"artifact": sys.argv[1], "weights": sys.argv[2],
       **json.loads(sys.argv[3])}
print(json.dumps(row))
with open("/tmp/serve_rows.jsonl", "a") as f:
    f.write(json.dumps(row) + "\n")
EOF
}

for N in 1 64; do
  python "$REPO/tools/export.py" experiment=consistency/mnist \
      --sampler multistep --steps 1 --n "$N" --platforms tpu \
      --out "/tmp/consistency1_b$N.jaxexport"
  row "consistency_1step_b$N" "/tmp/consistency1_b$N.jaxexport" init

  if [ -n "$DD_CK" ]; then
    python "$REPO/tools/export.py" experiment=ddpm/cifar10 \
        --ckpt "$DD_CK" --sampler dpm --steps 20 --n "$N" \
        --platforms tpu --out "/tmp/ddpm_dpm20_b$N.jaxexport"
    W=trained
  else
    python "$REPO/tools/export.py" experiment=ddpm/cifar10 \
        --sampler dpm --steps 20 --n "$N" \
        --platforms tpu --out "/tmp/ddpm_dpm20_b$N.jaxexport"
    W=init
  fi
  row "ddpm_dpm20_b$N" "/tmp/ddpm_dpm20_b$N.jaxexport" "$W"
done

python - <<'EOF'
import json
from pathlib import Path
rows = [json.loads(l) for l in
        Path("/tmp/serve_rows.jsonl").read_text().strip().splitlines()]
Path("benchmarks/serve_round5.json").write_text(
    json.dumps({"requests_per_row": 100, "stack": "HTTP (in-process "
                "ThreadingHTTPServer, urllib client)", "rows": rows},
               indent=1))
print(f"wrote benchmarks/serve_round5.json ({len(rows)} rows)")
EOF
