"""Trainer: the epoch-loop runtime (replaces PyTorch-Lightning).

The reference delegates its loop to Lightning (SURVEY.md §1 layer 7/8); here
the runtime is explicit and TPU-shaped:

- ONE jitted train step per model (state donated, so parameters/optimizer
  state update in place in HBM; no host round-trips on the hot path);
- batch tensors are host-sharded along the ``data`` mesh axis and fed through
  a double-buffered device-put prefetcher, so the input pipeline overlaps
  compute;
- metrics are fetched only every ``log_every_n_steps`` (device->host syncs
  are the silent killer of small-model step time);
- validation fans out ValidationResult to callbacks (grids/FID/traversal),
  matching Lightning's callback cadence: ``check_val_every_n_epoch``;
- orbax checkpoints carry {params, opt_states, mutables, step, rng}.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as mesh_lib
from ..utils.utils import get_logger
from .logging import MetricAccumulator, NoOpLogger, TensorBoardLogger

log = get_logger(__name__)


class Trainer:
    def __init__(
        self,
        devices: int = 1,
        max_epochs: int = 20,
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 50,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        fast_dev_run: bool = False,
        seed: int = 42,
        steps_per_execution: int = 1,
        mesh: Optional[Dict[str, int]] = None,
        ckpt_every_n_epochs: int = 1,
        resume: Optional[str] = None,
        callbacks: Sequence[Any] = (),
        logger: Optional[TensorBoardLogger] = None,
        enable_checkpointing: bool = True,
        profile: bool = False,
        **_: Any,
    ):
        self.max_epochs = int(max_epochs)
        self.check_val_every_n_epoch = int(check_val_every_n_epoch)
        self.log_every_n_steps = int(log_every_n_steps)
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.fast_dev_run = bool(fast_dev_run)
        self.seed = int(seed) if seed is not None else 0
        if isinstance(steps_per_execution, str):
            if steps_per_execution != "auto":
                raise ValueError(
                    f"steps_per_execution must be an int or 'auto', got "
                    f"{steps_per_execution!r}")
            self.steps_per_execution = "auto"
        else:
            self.steps_per_execution = max(1, int(steps_per_execution))
        self.ckpt_every_n_epochs = int(ckpt_every_n_epochs)
        self.resume = resume
        self.callbacks = list(callbacks)
        self.logger = logger if logger is not None else NoOpLogger()
        self.enable_checkpointing = enable_checkpointing
        self.profile = profile

        mesh_cfg = mesh or {}
        data_axis = mesh_cfg.get("data", -1) if isinstance(mesh_cfg, dict) else -1
        model_axis = mesh_cfg.get("model", 1) if isinstance(mesh_cfg, dict) else 1
        # model-axis sharding strategy: "fsdp" (ZeRO-3 state sharding),
        # "tensor" (Megatron column/row specs on transformer blocks), or
        # "pipeline" (GPipe stage axis — parallel/pipeline.py; needs
        # mesh.stage > 1 and a model exposing enable_pipeline, i.e. the
        # DiT-backboned diffusion families)
        self.mesh_mode = (mesh_cfg.get("mode", "fsdp")
                          if isinstance(mesh_cfg, dict) else "fsdp")
        stage_axis = (int(mesh_cfg.get("stage", 1))
                      if isinstance(mesh_cfg, dict) else 1)
        self.pipe_microbatches = (int(mesh_cfg.get("microbatches", 1))
                                  if isinstance(mesh_cfg, dict) else 1)
        # mesh.sequence=true: Megatron-SP token-axis activation sharding on
        # the model axis (composes with mode="tensor" on the same mesh)
        self.seq_parallel = (bool(mesh_cfg.get("sequence", False))
                             if isinstance(mesh_cfg, dict) else False)
        if self.mesh_mode not in ("fsdp", "tensor", "pipeline"):
            raise ValueError(f"mesh.mode must be fsdp|tensor|pipeline, "
                             f"got {self.mesh_mode!r}")
        if (devices not in (None, -1) and int(devices) > 0
                and data_axis in (-1, None) and int(model_axis or 1) == 1):
            # Lightning `devices: 1` semantics: cap the mesh size.
            data_axis = -1 if int(devices) >= len(jax.devices()) else int(devices)
        if self.mesh_mode == "pipeline" or stage_axis > 1:
            from ..parallel import pipeline as pipe_lib
            self.mesh_mode = "pipeline"
            if stage_axis <= 1:
                raise ValueError("mesh.mode=pipeline needs mesh.stage > 1")
            n_dev = len(jax.devices())
            d = (n_dev // stage_axis if data_axis in (-1, None)
                 else int(data_axis))
            self.mesh = pipe_lib.make_pipeline_mesh(stage=stage_axis,
                                                    data=max(1, d))
        else:
            self.mesh = mesh_lib.make_mesh(data=data_axis if data_axis else 1,
                                           model=model_axis)

        if self.fast_dev_run:
            self.max_epochs = 1
            self.limit_train_batches = 1
            self.limit_val_batches = 1
            self.enable_checkpointing = False

        # populated during fit
        self.state = None
        self.model = None
        self.datamodule = None
        self.current_epoch = 0
        self.global_step = 0
        self.callback_metrics: Dict[str, float] = {}
        self.ckpt_manager = None

    def _shard_state(self, state, model):
        """Place the TrainState on the mesh per the configured mode."""
        if self.mesh_mode == "pipeline":
            from ..parallel import pipeline as pipe_lib
            depth = int(getattr(model, "hparams", {}).get("depth", 0))
            return pipe_lib.shard_pipeline_state(self.mesh, state, depth)
        return mesh_lib.shard_state(self.mesh, state, mode=self.mesh_mode)

    # ------------------------------------------------------------------- data
    def _epoch_batches(self, arrays, batch_size: int, rng: np.random.Generator,
                       shuffle: bool, limit: Optional[int]):
        from ..data.loader import epoch_batches
        n_dev = self.mesh.devices.size
        return epoch_batches(arrays, batch_size, rng=rng, shuffle=shuffle,
                             limit=limit, divisor=n_dev)

    # -------------------------------------------------------------------- fit
    def fit(self, model, datamodule) -> None:
        self.model = model
        self.datamodule = datamodule
        datamodule.prepare_data()
        datamodule.setup()

        train_arrays = datamodule.train_arrays()
        val_arrays = datamodule.val_arrays()
        batch_size = int(datamodule.batch_size)
        n_train = len(train_arrays[0])
        steps_per_epoch = max(n_train // batch_size, 1)
        if self.limit_train_batches:
            steps_per_epoch = min(steps_per_epoch, int(self.limit_train_batches))
        model.steps_per_epoch = steps_per_epoch

        # hyperparameter logging (parity: src/utils/utils.py:126-166)
        hp = {}
        if hasattr(model, "hparams"):
            hp.update({f"model/{k}": v for k, v in model.hparams.items()
                       if isinstance(v, (int, float, bool, str))})
        hp["datamodule/batch_size"] = batch_size
        hp["trainer/max_epochs"] = self.max_epochs
        self.logger.log_hyperparams(hp)

        if self.mesh_mode == "pipeline":
            if not hasattr(model, "enable_pipeline"):
                raise ValueError(
                    f"mesh.mode=pipeline needs a model with enable_pipeline "
                    f"(the DiT-backboned families); {type(model).__name__} "
                    f"has none")
            model.enable_pipeline(self.mesh, self.pipe_microbatches)
        if self.seq_parallel:
            if not hasattr(model, "enable_sequence_parallel"):
                raise ValueError(
                    f"mesh.sequence=true needs a model with "
                    f"enable_sequence_parallel; {type(model).__name__} "
                    f"has none")
            model.enable_sequence_parallel(self.mesh)

        init_rng = jax.random.PRNGKey(self.seed)
        # jit the init: eager init dispatches hundreds of tiny ops, which is
        # pathological over a remote-device link (axon tunnel)
        state = jax.jit(model.init_state)(init_rng)
        if hasattr(model, "on_fit_start"):
            # data-dependent one-time calibration (e.g. LatentDDPM's
            # latent_scale=auto); deterministic, so it runs BEFORE a
            # resume restore and the checkpointed value wins.
            state = model.on_fit_start(state, train_arrays)
        state = self._shard_state(state, model)

        if self.enable_checkpointing:
            from .checkpoint import CheckpointManager
            self.ckpt_manager = CheckpointManager("checkpoints")
            if self.resume:
                self.ckpt_manager = CheckpointManager(str(self.resume))
            if self.resume and self.ckpt_manager.latest_step() is not None:
                state = self.ckpt_manager.restore(state)
                state = model.on_restore(state)  # param-invariant migrations
                state = self._shard_state(state, model)
                log.info("resumed from step %s", int(state.step))

        # steps_per_execution > 1: K train steps per device dispatch via
        # lax.scan (models/base.py train_step_n) — amortises host dispatch
        # for small/fast models; metrics come back phase-merged (nanmean).
        # "auto" (the default since round 3) measures the single-step wall
        # time on a throwaway state copy and chains just enough steps that
        # per-dispatch overhead is amortised (VERDICT r2 next-round #3).
        k_exec = self.steps_per_execution
        if k_exec == "auto":
            k_exec = self._auto_steps_per_execution(
                model, state, train_arrays, batch_size, steps_per_epoch)
            log.info("steps_per_execution=auto resolved to %d", k_exec)
        self.steps_per_execution = k_exec  # resolved value, callback-visible
        if k_exec > 1:
            train_step = jax.jit(model.train_step_n, donate_argnums=0)
        else:
            train_step = jax.jit(model.train_step, donate_argnums=0)
        val_step = jax.jit(model.validation_step, static_argnames=("sample",))
        self._step_flops = None  # filled on first batch via XLA cost analysis

        data_rng = np.random.default_rng(self.seed)
        acc = MetricAccumulator()
        start_epoch = int(jax.device_get(state.step)) // steps_per_epoch
        self.global_step = int(jax.device_get(state.step))
        pending_metrics = None  # (step, device metrics) fetched one step late

        if self.profile:
            # jax.profiler trace of the steady-state steps -> TB profile
            # plugin (SURVEY.md §5 tracing row; the reference has only tqdm)
            from jax import profiler as _jprof
            _jprof.start_trace(getattr(self.logger, "save_dir",
                                       "tensorboard/") or "profile")

        t_train = time.time()
        for epoch in range(start_epoch, self.max_epochs):
            self.current_epoch = epoch
            acc.reset()
            epoch_t0 = time.time()
            n_batches = 0
            from ..data.loader import DevicePrefetcher, chunk_batches
            batches = self._epoch_batches(train_arrays, batch_size, data_rng,
                                          shuffle=True, limit=self.limit_train_batches)
            if k_exec > 1:
                batches = chunk_batches(batches, k_exec)
                sharding = mesh_lib.chunk_batch_sharding(self.mesh)
            else:
                sharding = None
            prefetcher = DevicePrefetcher(batches, self.mesh, sharding=sharding)
            n_exec = 0
            for batch in prefetcher:
                k_this = len(batch[0]) if k_exec > 1 else 1
                if self._step_flops is None:
                    # XLA cost analysis counts a lax.scan body ONCE (verified
                    # empirically, tests/test_chained.py::test_cost_analysis_
                    # counts_scan_body_once), so the chained program's flops
                    # are already per-STEP — no division by k_this.
                    self._step_flops = self._cost_flops(train_step, state,
                                                        batch)
                state, metrics = train_step(state, batch)
                if pending_metrics is not None:
                    step_no, dev_m = pending_metrics
                    host_m = {k: float(v) for k, v in jax.device_get(dev_m).items()}
                    acc.update(host_m)
                    self.logger.log_scalars(host_m, step_no)
                    pending_metrics = None
                # Sample TWO consecutive steps per logging window: models
                # with step-parity phase alternation (GAN G/D via lax.cond)
                # emit each phase's metrics as NaN on the other phase's
                # steps, and an even log_every_n_steps would otherwise
                # never observe the odd-parity phase (d_loss invisible).
                # (Chained execution merges phases via nanmean, so one
                # sample per window suffices there.)
                if self.global_step % self.log_every_n_steps < max(2, k_this):
                    pending_metrics = (self.global_step, metrics)
                last_metrics = metrics
                self.global_step += k_this
                n_batches += k_this
                n_exec += 1
            if pending_metrics is None and n_batches and not acc.compute():
                # short epochs (steps_per_epoch < log stride) would otherwise
                # sample nothing and show stale epoch summaries
                pending_metrics = (self.global_step - 1, last_metrics)
            if pending_metrics is not None:  # flush the epoch's last sample
                step_no, dev_m = pending_metrics
                host_m = {k: float(v) for k, v in jax.device_get(dev_m).items()}
                acc.update(host_m)
                self.logger.log_scalars(host_m, step_no)
                pending_metrics = None
            jax.block_until_ready(state.params)
            self.state = state
            epoch_time = time.time() - epoch_t0
            imgs_per_sec = n_batches * batch_size / max(epoch_time, 1e-9)
            self.logger.log_scalar("perf/imgs_per_sec", imgs_per_sec, self.global_step)
            self.logger.log_scalar("perf/epoch_time_sec", epoch_time, self.global_step)
            if self._step_flops:
                achieved = self._step_flops * n_batches / max(epoch_time, 1e-9)
                self.logger.log_scalar("perf/achieved_tflops",
                                       achieved / 1e12, self.global_step)
                peak = _peak_flops_per_device() * jax.device_count()
                if peak:
                    self.logger.log_scalar("perf/mfu", achieved / peak,
                                           self.global_step)
            self.callback_metrics.update(acc.compute())
            log.info("epoch %d done in %.1fs (%.0f imgs/s) %s", epoch, epoch_time,
                     imgs_per_sec,
                     {k: round(v, 4) for k, v in list(acc.compute().items())[:6]})

            if (epoch + 1) % self.check_val_every_n_epoch == 0 or epoch == self.max_epochs - 1:
                self._run_validation(val_step, val_arrays, batch_size, epoch)

            model.on_train_epoch_end(self)
            for cb in self.callbacks:
                if hasattr(cb, "on_train_epoch_end"):
                    cb.on_train_epoch_end(self, model)

            if (self.enable_checkpointing and self.ckpt_manager is not None
                    and (epoch + 1) % self.ckpt_every_n_epochs == 0):
                self.ckpt_manager.save(int(jax.device_get(state.step)), state)

        if self.profile:
            from jax import profiler as _jprof
            _jprof.stop_trace()

        self.state = state
        if self.enable_checkpointing and self.ckpt_manager is not None:
            self.ckpt_manager.save(int(jax.device_get(state.step)), state)
            self.ckpt_manager.wait()
        for cb in self.callbacks:
            if hasattr(cb, "on_train_end"):
                cb.on_train_end(self, model)
        self.logger.finalize()
        log.info("fit finished in %.1fs", time.time() - t_train)

    # ------------------------------------------------------------- validation
    def _run_validation(self, val_step, val_arrays, batch_size: int,
                        epoch: int) -> None:
        from ..models.base import ValidationResult

        model = self.model
        for cb in self.callbacks:
            if hasattr(cb, "on_validation_epoch_start"):
                cb.on_validation_epoch_start(self, model)
        acc = MetricAccumulator()
        rng = np.random.default_rng(self.seed + 1)
        batches = self._epoch_batches(val_arrays, batch_size, rng,
                                      shuffle=False, limit=self.limit_val_batches)
        for batch_idx, batch in enumerate(batches):
            dev_batch = mesh_lib.shard_batch(self.mesh, batch)
            step_rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed + 7919), epoch * 100003 + batch_idx)
            result, metrics = val_step(self.state, dev_batch, step_rng,
                                       sample=(batch_idx == 0))
            host = jax.device_get((result, metrics))
            result_host, metrics_host = host
            acc.update({k: float(v) for k, v in metrics_host.items()})
            # jitted validation_step returns a plain dict (pytree); wrap it
            out = ValidationResult(
                others={k: _np(v) for k, v in (result_host.get("others") or {}).items()
                        if v is not None},
                real_image=_np(result_host.get("real_image")),
                fake_image=_np(result_host.get("fake_image")),
                recon_image=_np(result_host.get("recon_image")),
                label=_np(result_host.get("label")),
                encode_latent=_np(result_host.get("encode_latent")),
            )
            for cb in self.callbacks:
                if hasattr(cb, "on_validation_batch_end"):
                    cb.on_validation_batch_end(self, model, out, batch, batch_idx)
        val_metrics = acc.compute()
        self.callback_metrics.update(val_metrics)
        self.logger.log_scalars(val_metrics, self.global_step)
        for cb in self.callbacks:
            if hasattr(cb, "on_validation_epoch_end"):
                cb.on_validation_epoch_end(self, model)

    def test(self, model=None, datamodule=None) -> Dict[str, float]:
        """Evaluate on the val/test split (``trainer.test()`` parity,
        `src/train.py:66-68`; the reference datamodules use the test set as
        the val split, SURVEY §8)."""
        model = model or self.model
        datamodule = datamodule or self.datamodule
        assert self.state is not None, "call fit() first"
        val_step = jax.jit(model.validation_step, static_argnames=("sample",))
        self._run_validation(val_step, datamodule.val_arrays(),
                             int(datamodule.batch_size), self.current_epoch)
        return dict(self.callback_metrics)

    # ------------------------------------------------- auto step chaining
    @staticmethod
    def resolve_chain_k(t_step_s: float, steps_per_epoch: int,
                        dispatch_s: float = 0.0025,
                        max_overhead: float = 0.02,
                        max_k: int = 32) -> int:
        """Pick K so per-dispatch overhead is <= ``max_overhead`` of the
        work it covers: K = ceil(dispatch / (max_overhead * t_step)).

        Per-dispatch overhead through the remote-TPU tunnel is ~1.7-2.7 ms
        (round-3 trace; re-measured on the flagship at K=2: wall 20.75 ms
        vs device-busy 19.38 ms => ~2.7 ms/dispatch).  Under this policy
        the 21 ms flagship step chains K=6 (~2% overhead), a 3 ms GAN step
        hits the K=32 cap, and steps >= 125 ms stay K=1 because their own
        dispatch share is already under the target.  The round-2 flat
        50 ms-per-dispatch target left 4-8% of wall on the table for
        20-30 ms steps (and pinned K=1 above 25 ms)."""
        k = -(-dispatch_s // (max_overhead * max(t_step_s, 1e-4)))
        return max(1, min(max_k, int(k), max(steps_per_epoch, 1)))

    def _auto_steps_per_execution(self, model, state, train_arrays,
                                  batch_size: int,
                                  steps_per_epoch: int) -> int:
        """Time the jitted single step on a throwaway state copy (donation
        consumes it; the real state and RNG stream stay untouched, so
        auto-K never perturbs the training trajectory)."""
        probe_batch = next(iter(self._epoch_batches(
            train_arrays, batch_size, np.random.default_rng(0),
            shuffle=False, limit=1)), None)
        if probe_batch is None:
            return 1
        try:
            dev_batch = mesh_lib.shard_batch(self.mesh, probe_batch)
            step = jax.jit(model.train_step, donate_argnums=0)
            # jitted copy: one dispatch (eager per-leaf copies would be one
            # tunnel round-trip per leaf, NOTES.md round-1 lesson)
            probe_state = jax.jit(
                lambda s: jax.tree_util.tree_map(jnp.copy, s))(state)
            probe_state, _ = step(probe_state, dev_batch)  # compile+warm
            jax.device_get(jax.tree_util.tree_leaves(probe_state.params)[0])
            n_timed = 3
            t0 = time.time()
            for _ in range(n_timed):
                probe_state, _ = step(probe_state, dev_batch)
            jax.device_get(jax.tree_util.tree_leaves(probe_state.params)[0])
            t_step = (time.time() - t0) / n_timed
        except Exception as exc:  # probe is advisory — fall back to K=1
            log.warning("auto steps_per_execution probe failed (%s); "
                        "falling back to 1", exc)
            return 1
        return self.resolve_chain_k(t_step, steps_per_epoch)

    @staticmethod
    def _cost_flops(jitted, state, batch):
        """FLOPs/step from XLA cost analysis; 0.0 (not None) on failure so
        the probe runs once, never per batch."""
        try:
            cost = jitted.lower(state, batch).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    def log(self, tag: str, value: float) -> None:
        """Callback-facing scalar logging (FID uses this)."""
        self.callback_metrics[tag] = float(value)
        self.logger.log_scalar(tag, value, self.global_step)


def _peak_flops_per_device() -> float:
    """bf16 peak FLOP/s for the local accelerator (public figures); 0 when
    unknown (MFU then isn't logged).  CPU gets a nominal 1 TF/s so the
    perf/mfu scalar exists in CPU smoke runs too."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for key, val in (("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
                     ("v6e", 918e12), ("trillium", 918e12), ("v4", 275e12)):
        if key in kind:
            return val
    return 1e12 if dev.platform == "cpu" else 0.0


def _np(x):
    return None if x is None else np.asarray(x)
