"""GPipe pipeline parallelism (parallel/pipeline.py + DiT block_mode).

Ladder: stacked-scan layout == unrolled layout -> pipelined schedule ==
sequential scan (forward AND grads) -> full DDPM/DiT train step under a
(data, stage) mesh matches the unpipelined step loss-for-loss.

Beyond-parity: the reference has no pipeline story (SURVEY.md §2.2 — DDP
only, disabled); equality against the sequential path is the whole spec.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from igm_tpu.config import to_node
from igm_tpu.models.ddpm import DDPM
from igm_tpu.networks.dit import DiT
from igm_tpu.parallel.pipeline import (STAGE_AXIS, gpipe_apply,
                                       make_pipeline_mesh,
                                       pipeline_state_sharding)

DEPTH, DIM, HEADS, PATCH, IMG = 4, 64, 2, 4, 16


def _dit(**kw):
    return DiT(dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH, channels=3,
               **kw)


def _inputs(b=8, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, IMG, IMG, 3), jnp.float32)
    t = jnp.asarray(r.randint(0, 10, size=(b,)), jnp.float32)
    return x, t


def _stack_unrolled(params):
    """DiTBlock_0..D-1 subtrees -> the stacked ``blocks`` layout."""
    blocks = [params[f"DiTBlock_{i}"] for i in range(DEPTH)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def test_scan_matches_unroll():
    x, t = _inputs()
    unroll = _dit()
    scan = _dit(block_mode="scan")
    pu = unroll.init(jax.random.PRNGKey(0), x, t)["params"]
    ps = dict(pu)
    ps["blocks"] = _stack_unrolled(pu)
    for i in range(DEPTH):
        ps.pop(f"DiTBlock_{i}")
    out_u = unroll.apply({"params": pu}, x, t)
    out_s = scan.apply({"params": ps}, x, t)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pipeline_matches_scan(n_micro):
    mesh = make_pipeline_mesh(stage=4, data=2)
    x, t = _inputs(b=8)
    scan = _dit(block_mode="scan")
    pipe = _dit(block_mode="scan", pipe_mesh=mesh,
                pipe_microbatches=n_micro)
    params = scan.init(jax.random.PRNGKey(1), x, t)["params"]

    out_s = jax.jit(lambda p: scan.apply({"params": p}, x, t))(params)
    out_p = jax.jit(lambda p: pipe.apply({"params": p}, x, t))(params)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)

    def loss_s(p):
        return jnp.mean(jnp.square(scan.apply({"params": p}, x, t)))

    def loss_p(p):
        return jnp.mean(jnp.square(pipe.apply({"params": p}, x, t)))

    g_s = jax.jit(jax.grad(loss_s))(params)
    g_p = jax.jit(jax.grad(loss_p))(params)
    flat_s, _ = ravel_pytree(g_s)
    flat_p, _ = ravel_pytree(g_p)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_s),
                               rtol=1e-4, atol=1e-6)


def test_pipeline_remat_matches():
    """jax.checkpoint per block (the production memory config) keeps the
    pipelined grads identical."""
    mesh = make_pipeline_mesh(stage=4, data=1)
    x, t = _inputs(b=4)
    scan = _dit(block_mode="scan")
    pipe = _dit(block_mode="scan", remat=True, pipe_mesh=mesh,
                pipe_microbatches=2)
    params = scan.init(jax.random.PRNGKey(2), x, t)["params"]
    g_s = jax.jit(jax.grad(lambda p: jnp.mean(
        jnp.square(scan.apply({"params": p}, x, t)))))(params)
    g_p = jax.jit(jax.grad(lambda p: jnp.mean(
        jnp.square(pipe.apply({"params": p}, x, t)))))(params)
    flat_s, _ = ravel_pytree(g_s)
    flat_p, _ = ravel_pytree(g_p)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_s),
                               rtol=1e-4, atol=1e-6)


def _ddpm(pipe_mesh=None, n_micro=1):
    dm = to_node({"width": IMG, "height": IMG, "channels": 3,
                  "transforms": {"convert": True, "normalize": True}})
    m = DDPM(datamodule=dm, hidden_dim=DIM, timesteps=8, loss_type="l2",
             network="dit", depth=DEPTH, heads=HEADS, patch=PATCH,
             compute_dtype="float32", block_mode="scan",
             pipe_mesh=pipe_mesh, pipe_microbatches=n_micro)
    m.steps_per_epoch = 10
    return m


def test_pipeline_ddpm_train_step_matches():
    """Full flagship-family train step: pipelined DiT == sequential DiT,
    same seed, loss and updated params equal."""
    mesh = make_pipeline_mesh(stage=4, data=2)
    seq, pipe = _ddpm(), _ddpm(pipe_mesh=mesh, n_micro=2)
    state_s = jax.jit(seq.init_state)(jax.random.PRNGKey(3))
    state_p = jax.jit(pipe.init_state)(jax.random.PRNGKey(3))
    # identical init: pipeline mode only changes the apply schedule
    fs, _ = ravel_pytree(state_s.params)
    fp, _ = ravel_pytree(state_p.params)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fp))

    r = np.random.RandomState(7)
    batch = (r.randint(0, 255, size=(8, IMG, IMG, 3), dtype=np.uint8),
             np.zeros((8,), np.int32))
    state_s, met_s = jax.jit(seq.train_step)(state_s, batch)
    state_p, met_p = jax.jit(pipe.train_step)(state_p, batch)
    ls = float(met_s["train_loss/loss"])
    lp = float(met_p["train_loss/loss"])
    assert np.isfinite(lp)
    np.testing.assert_allclose(lp, ls, rtol=1e-5)
    fs, _ = ravel_pytree(state_s.params)
    fp, _ = ravel_pytree(state_p.params)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fs),
                               rtol=1e-4, atol=1e-6)


def test_pipeline_state_sharding_shards_blocks():
    mesh = make_pipeline_mesh(stage=4, data=2)
    pipe = _ddpm(pipe_mesh=mesh, n_micro=2)
    state = jax.jit(pipe.init_state)(jax.random.PRNGKey(0))
    sh = pipeline_state_sharding(mesh, state, depth=DEPTH)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    staged = [s for p, s in flat
              if any(getattr(k, "key", None) == "blocks" for k in p)]
    rest = [s for p, s in flat
            if not any(getattr(k, "key", None) == "blocks" for k in p)]
    # every blocks leaf (params AND adam moments, which mirror the param
    # paths) shards its depth axis over stage; everything else replicated
    assert staged and all(STAGE_AXIS in tuple(s.spec) for s in staged)
    assert len(staged) > len(jax.tree_util.tree_leaves(
        state.params["denoise"]["blocks"])), "moments not covered"
    assert all(tuple(s.spec) in ((), (None,)) or STAGE_AXIS not in
               tuple(s.spec) for s in rest)


@pytest.mark.slow
def test_trainer_pipeline_mode_e2e(config_dir, tmp_path):
    """CLI path: trainer.mesh.mode=pipeline trains the DiT flagship config
    end-to-end (enable_pipeline rebuild, stage-sharded state, train +
    validation sampling) on the (2 data, 4 stage) CPU mesh."""
    import os
    from igm_tpu.config import compose
    from igm_tpu.train import train

    overrides = [
        "experiment=ddpm/cifar10_dit", "trainer.max_epochs=1",
        "trainer.limit_train_batches=2", "trainer.limit_val_batches=1",
        "trainer.enable_checkpointing=False", "trainer.log_every_n_steps=1",
        "+trainer.mesh.mode=pipeline", "+trainer.mesh.stage=4",
        "+trainer.mesh.microbatches=2",
        "model.hidden_dim=32", "model.depth=4", "model.heads=2",
        "model.patch=8", "model.timesteps=8", "model.ema_decay=0",
        "+model.sample_batch=8", "datamodule.batch_size=16",
        "print_config=False",
    ]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train(compose(config_dir, overrides))
    finally:
        os.chdir(cwd)


def test_gpipe_raises_on_bad_shapes():
    mesh = make_pipeline_mesh(stage=4, data=1)
    blocks = {"w": jnp.zeros((3, 2, 2))}  # depth 3 not divisible by 4
    with pytest.raises(ValueError, match="divisible"):
        gpipe_apply(lambda p, x, c: x, blocks, jnp.zeros((4, 2, 2)),
                    jnp.zeros((4, 2)), mesh, 1)
    blocks = {"w": jnp.zeros((4, 2, 2))}
    with pytest.raises(ValueError, match="batch"):
        gpipe_apply(lambda p, x, c: x, blocks, jnp.zeros((3, 2, 2)),
                    jnp.zeros((3, 2)), mesh, 2)
