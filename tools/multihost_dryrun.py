#!/usr/bin/env python
"""Multi-process (multi-host) SPMD dryrun on the CPU backend.

Proves the ``IGM_MULTIHOST`` path (igm_tpu/train.py: jax.distributed +
global mesh, docs/SCALING.md) actually executes: N separate Python
processes, each owning K local virtual CPU devices, initialise
jax.distributed against a shared coordinator, build ONE global
N*K-device mesh, and run one jitted DDPM training step with the
production shardings (batch split along ``data``, state replicated,
XLA-emitted gradient all-reduce now crossing PROCESS boundaries).

    python tools/multihost_dryrun.py                # spawn 2 procs x 2 devs
    python tools/multihost_dryrun.py --procs 2 --local-devices 4

Parent prints one JSON line {"ok": true, "losses": [...]} and exits 0
iff every process finished with the SAME finite loss (replicated-state
consistency across hosts).
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def child(args) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.procs,
                               process_id=args.process_id)
    assert jax.process_count() == args.procs
    n_global = args.procs * args.local_devices
    assert jax.device_count() == n_global, jax.device_count()
    assert len(jax.local_devices()) == args.local_devices

    import numpy as np
    sys.path.insert(0, str(REPO))
    from __graft_entry__ import _make_ddpm
    from igm_tpu.parallel import mesh as mesh_lib

    # spans ALL processes' devices; --model-axis > 1 builds a 2-D
    # (data, model) mesh whose FSDP/TP shards cross the PROCESS boundary;
    # --fsdp-axis > 1 (with model > 1) builds the composed 3-D
    # (data, fsdp, model) mesh — TP + ZeRO + DP in one step, collectives
    # crossing processes on BOTH sharded axes
    if args.stage_axis > 1:
        # GPipe pipeline mesh: the block stack shards over ``stage`` and the
        # lax.ppermute activation hand-off CROSSES the process boundary
        # (stages straddle the two processes)
        from igm_tpu.config import to_node
        from igm_tpu.models.ddpm import DDPM
        from igm_tpu.parallel import pipeline as pipe_lib

        mesh = pipe_lib.make_pipeline_mesh(
            stage=args.stage_axis, data=n_global // args.stage_axis)
        dm_cfg = to_node({"width": 16, "height": 16, "channels": 3,
                          "transforms": {"convert": True, "normalize": True}})
        model = DDPM(datamodule=dm_cfg, hidden_dim=32, timesteps=4,
                     network="dit", depth=args.stage_axis, heads=2, patch=4,
                     loss_type="l2", compute_dtype="float32",
                     block_mode="scan", pipe_mesh=mesh, pipe_microbatches=2)
        model.steps_per_epoch = 100
        shapes = jax.eval_shape(model.init_state, jax.random.PRNGKey(0))
        state = jax.jit(model.init_state,
                        out_shardings=pipe_lib.pipeline_state_sharding(
                            mesh, shapes, depth=args.stage_axis))(
            jax.random.PRNGKey(0))
        qkv = state.params["denoise"]["blocks"]["qkv"]["kernel"]
        assert pipe_lib.STAGE_AXIS in tuple(qkv.sharding.spec), (
            "pipeline dryrun vacuous: blocks not sharded over stage")
        step = jax.jit(model.train_step, donate_argnums=0)
        batch = (np.zeros((2 * n_global, 16, 16, 3), np.uint8),
                 np.zeros((2 * n_global,), np.int32))
        state, metrics = step(state, mesh_lib.shard_batch(mesh, batch))
        jax.block_until_ready(state.params)
        loss = float(jax.device_get(metrics["train_loss/loss"]))
        print(json.dumps({"process_id": args.process_id, "loss": loss,
                          "process_count": jax.process_count(),
                          "global_devices": n_global}), flush=True)
        jax.distributed.shutdown()
        return

    mesh = mesh_lib.make_mesh(model=args.model_axis, fsdp=args.fsdp_axis)
    if args.mesh_mode == "tensor":
        # Megatron TP needs a transformer backbone: tiny DiT-DDPM
        from igm_tpu.config import to_node
        from igm_tpu.models.ddpm import DDPM
        dm_cfg = to_node({"width": 16, "height": 16, "channels": 3,
                          "transforms": {"convert": True, "normalize": True}})
        model = DDPM(datamodule=dm_cfg, hidden_dim=32, timesteps=4,
                     network="dit", depth=2, heads=2, patch=4,
                     loss_type="l2", compute_dtype="float32")
        model.steps_per_epoch = 100
    else:
        model = _make_ddpm(hidden_dim=8, timesteps=4, batch=2 * n_global,
                           image=16)
    # init with explicit out_shardings: in multi-process runs the state must
    # be BORN sharded (a post-hoc cross-host device_put reshard hangs)
    state = mesh_lib.init_state_sharded(model, mesh, jax.random.PRNGKey(0),
                                        mode=args.mesh_mode)
    if args.model_axis > 1:
        # non-vacuousness: at least one param leaf must actually be sharded
        # over the model axis (mirrors __graft_entry__.dryrun_multichip)
        specs = [x.sharding.spec
                 for x in jax.tree_util.tree_leaves(state.params)
                 if hasattr(x, "sharding")]
        assert any(mesh_lib.MODEL_AXIS in tuple(s) for s in specs), (
            "model-axis sharding vacuous: no param sharded over it")
        if args.mesh_mode == "tensor":
            qkv = state.params["denoise"]["DiTBlock_0"]["qkv"]["kernel"]
            assert mesh_lib.MODEL_AXIS in tuple(qkv.sharding.spec), (
                "TP vacuous: qkv kernel not sharded over the model axis")
        if args.fsdp_axis > 1:
            assert any(mesh_lib.FSDP_AXIS in tuple(s) for s in specs), (
                "composed mesh vacuous: nothing sharded over the fsdp axis")

    step = jax.jit(model.train_step, donate_argnums=0)
    # every process supplies the same GLOBAL batch; device_put scatters the
    # addressable shards (docs/SCALING.md "each host feeds its shard")
    batch = (np.zeros((2 * n_global, 16, 16, 3), np.uint8),
             np.zeros((2 * n_global,), np.int32))
    dev_batch = mesh_lib.shard_batch(mesh, batch)
    state, metrics = step(state, dev_batch)
    jax.block_until_ready(state.params)
    loss = float(jax.device_get(metrics["train_loss/loss"]))
    print(json.dumps({"process_id": args.process_id, "loss": loss,
                      "process_count": jax.process_count(),
                      "global_devices": n_global}), flush=True)
    jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--model-axis", type=int, default=1,
                    help=">1: 2-D (data, model) mesh — FSDP shards cross the process boundary")
    ap.add_argument("--mesh-mode", default="fsdp", choices=["fsdp", "tensor"],
                    help="model-axis strategy: ZeRO-3 state sharding or Megatron TP (DiT backbone)")
    ap.add_argument("--fsdp-axis", type=int, default=1,
                    help=">1 (with --model-axis >1): composed 3-D "
                         "(data, fsdp, model) mesh — TP + ZeRO + DP")
    ap.add_argument("--stage-axis", type=int, default=1,
                    help=">1: GPipe pipeline mesh (data, stage) — the "
                         "ppermute activation hop crosses processes")
    ap.add_argument("--process-id", type=int, default=None)  # child marker
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    if args.process_id is not None:
        child(args)
        return

    with socket.socket() as s:  # pick a free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {**os.environ, "IGM_PLATFORM": "cpu", "IGM_SYNTHETIC_DATA": "1"}
    env.pop("JAX_PLATFORMS", None)  # children force cpu via jax.config
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--procs", str(args.procs),
         "--local-devices", str(args.local_devices),
         "--process-id", str(i), "--coordinator", coord,
         "--model-axis", str(args.model_axis),
         "--fsdp-axis", str(args.fsdp_axis),
         "--stage-axis", str(args.stage_axis),
         "--mesh-mode", args.mesh_mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(args.procs)]

    outs = [p.communicate(timeout=args.timeout) for p in procs]
    losses, errs = [], []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            errs.append(f"proc {i} rc={p.returncode}: {err.strip()[-500:]}")
            continue
        losses.append(json.loads(out.strip().splitlines()[-1])["loss"])

    ok = (not errs and len(losses) == args.procs
          and all(abs(l - losses[0]) < 1e-6 for l in losses)
          and all(l == l and abs(l) < 1e9 for l in losses))
    print(json.dumps({"ok": ok, "losses": losses, "errors": errs,
                      "procs": args.procs,
                      "local_devices": args.local_devices,
                      "model_axis": args.model_axis,
                      "fsdp_axis": args.fsdp_axis,
                      "stage_axis": args.stage_axis,
                      "mesh_mode": args.mesh_mode}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
