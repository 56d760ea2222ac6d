#!/bin/bash
# Round-5 master queue: every on-chip measurement, strictly serialized
# (ONE TPU process at a time — NOTES.md operational rule).
#   1. bench refresh (sampler zoo incl. distilled students + fixed DDIM,
#      AR re-fence, beyond-parity train rows) -> *_round5.jsonl
#   2. galleries (ddpm_cifar retrain feeding the DDIM root-cause sweep,
#      latent_ddpm, score-SDE VP, MoE-DiT learning run)
#   3. CFG payoff sweep (cond_mnist retrains + guidance w in {0,1,2,4})
#   4. serving latency percentiles (uses the fresh ddpm_cifar ckpt)
#
#   bash benchmarks/run_round5_all.sh
set -u
cd "$(dirname "$0")/.."
REPO=$PWD

stamp() { echo "=== [$(date +%H:%M:%S)] $1"; }

stamp "1/4 bench refresh"
bash "$REPO/benchmarks/run_round5_benches.sh"

stamp "2/4 galleries + DDIM sweep"
bash "$REPO/benchmarks/run_round5_galleries.sh"

stamp "3/4 CFG payoff"
bash "$REPO/benchmarks/run_round5_cfg.sh"

stamp "4/4 serving latency"
DD_CK=""
if [ -f /tmp/last_rundir_ddpm_cifar ]; then
  DD_CK=$(find "$(cat /tmp/last_rundir_ddpm_cifar)" -maxdepth 2 -type d \
      -name checkpoints | head -1)
fi
bash "$REPO/benchmarks/run_round5_serve.sh" "$DD_CK"

stamp "round-5 queue complete"
