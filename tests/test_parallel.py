"""Data-parallel mesh tests on the 8-virtual-device CPU backend."""
import sys
import pytest
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_mesh_shapes():
    from igm_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    batch = (np.zeros((16, 4, 4, 1), np.uint8), np.zeros((16,), np.int32))
    dev = mesh_lib.shard_batch(mesh, batch)
    assert dev[0].sharding.num_devices == 8


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape


@pytest.mark.slow
def test_dp_grads_match_single_device():
    """One jitted GAN D-step on the 8-device mesh == single-device result."""
    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate
    from igm_tpu.parallel import mesh as mesh_lib

    cfg = compose(Path(__file__).resolve().parent.parent / "configs",
                  ["experiment=vae/mnist_mlp", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 10
    state = model.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (16, 28, 28, 1), dtype=np.uint8),
             np.zeros((16,), np.int32))

    # single device
    s1 = jax.device_put(state, jax.devices()[0])
    b1 = jax.device_put(batch, jax.devices()[0])
    s1out, m1 = jax.jit(model.train_step)(s1, b1)

    # 8-device mesh
    mesh = mesh_lib.make_mesh()
    s8 = mesh_lib.replicate(mesh, state)
    b8 = mesh_lib.shard_batch(mesh, batch)
    s8out, m8 = jax.jit(model.train_step)(s8, b8)

    np.testing.assert_allclose(
        float(m1["train_log/elbo"]), float(m8["train_log/elbo"]), rtol=2e-3)
    p1 = jax.device_get(s1out.params["encoder"])
    p8 = jax.device_get(s8out.params["encoder"])
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_fsdp_spec_shards_largest_divisible_axis():
    from igm_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # conv kernel (3,3,64,128): largest divisible axis is out-features
    spec = mesh_lib._fsdp_spec(mesh, np.zeros((3, 3, 64, 128)))
    assert tuple(spec) == (None, None, None, "model")
    # tiny bias stays replicated
    assert tuple(mesh_lib._fsdp_spec(mesh, np.zeros((64,)))) == ()
    # odd-size axes that don't divide stay replicated
    assert tuple(mesh_lib._fsdp_spec(mesh, np.zeros((7, 11) * 4))) == ()


@pytest.mark.slow
def test_fsdp_matches_single_device():
    """FSDP (2-D data*model mesh, sharded params+moments) is a memory layout,
    not a math change: one VAE train step must match the single-device step."""
    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate
    from igm_tpu.parallel import mesh as mesh_lib

    cfg = compose(Path(__file__).resolve().parent.parent / "configs",
                  ["experiment=vae/mnist_mlp", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 10
    state = model.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (16, 28, 28, 1), dtype=np.uint8),
             np.zeros((16,), np.int32))

    s1 = jax.device_put(state, jax.devices()[0])
    b1 = jax.device_put(batch, jax.devices()[0])
    s1out, m1 = jax.jit(model.train_step)(s1, b1)

    mesh = mesh_lib.make_mesh(model=2)  # (data=4, model=2)
    sf = mesh_lib.shard_state(mesh, state)
    # at least one large leaf must actually be sharded over the model axis
    shardings = [x.sharding.spec for x in jax.tree_util.tree_leaves(sf.params)
                 if hasattr(x, "sharding") and x.ndim >= 2]
    assert any("model" in tuple(s) for s in shardings), shardings
    bf = mesh_lib.shard_batch(mesh, batch)
    sfout, mf = jax.jit(model.train_step)(sf, bf)

    np.testing.assert_allclose(
        float(m1["train_log/elbo"]), float(mf["train_log/elbo"]), rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1out.params)),
                    jax.tree_util.tree_leaves(jax.device_get(sfout.params))):
        np.testing.assert_allclose(a, b, atol=2e-4)


def _tiny_dit_ddpm():
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 16, "height": 16, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm, hidden_dim=32, timesteps=8, network="dit",
                 depth=2, heads=2, patch=4, loss_type="l2",
                 compute_dtype="float32")
    model.steps_per_epoch = 10
    return model


def test_tp_specs_on_dit_tree():
    """Megatron specs land on the DiT block matrices (and their optimizer
    moments, which share tree paths): qkv/MLP-up column-parallel, proj/
    MLP-down row-parallel, row biases replicated.  eval_shape only — cheap."""
    from igm_tpu.parallel import mesh as mesh_lib

    model = _tiny_dit_ddpm()
    mesh = mesh_lib.make_mesh(model=2)
    shapes = jax.eval_shape(model.init_state, jax.random.PRNGKey(0))
    shardings = mesh_lib.state_shardings(mesh, shapes, mode="tensor")

    import jax.tree_util as jtu
    flat = {jtu.keystr(p): s for p, s in jtu.tree_leaves_with_path(shardings)}

    def spec(substr):
        hits = [s.spec for k, s in flat.items() if substr in k]
        assert hits, f"no leaf path contains {substr!r}"
        return tuple(hits[0])

    # params
    assert spec("DiTBlock_0']['qkv']['kernel") == (None, "model")
    assert spec("DiTBlock_0']['qkv']['bias") == ("model",)
    assert spec("DiTBlock_0']['proj']['kernel") == ("model", None)
    assert spec("DiTBlock_0']['proj']['bias") == ()
    assert spec("DiTBlock_0']['Dense_0']['kernel") == (None, "model")
    assert spec("DiTBlock_1']['Dense_1']['kernel") == ("model", None)
    # adam moments traverse the same named paths -> same specs
    mu_specs = [tuple(s.spec) for k, s in flat.items()
                if "qkv']['kernel" in k]
    assert all(s == (None, "model") for s in mu_specs), mu_specs
    # non-block leaves fall back to the FSDP rule (may or may not shard),
    # never a Megatron row/column spec by accident
    assert "model" not in tuple(spec("patch_embed']['bias"))


@pytest.mark.slow
def test_tensor_parallel_dit_matches_single_device():
    """Megatron TP over the `model` axis is math-preserving: two DiT-DDPM
    train steps on a (2,2) data*tensor mesh match the single-device
    trajectory.  GSPMD inserts the per-block all-reduces from param specs
    alone (no hand-written collectives)."""
    from igm_tpu.parallel import mesh as mesh_lib

    model = _tiny_dit_ddpm()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(0, 255, (8, 16, 16, 1), dtype=np.uint8),
         np.zeros((8,), np.int32))
        for _ in range(2)
    ]

    s1 = jax.device_put(state, jax.devices()[0])
    step1 = jax.jit(model.train_step)
    for b in batches:
        s1, m1 = step1(s1, jax.device_put(b, jax.devices()[0]))

    mesh = mesh_lib.make_mesh(data=2, model=2,
                              devices=jax.devices()[:4])
    st = mesh_lib.shard_state(mesh, state, mode="tensor")
    qkv = st.params["denoise"]["DiTBlock_0"]["qkv"]["kernel"]
    assert "model" in tuple(qkv.sharding.spec), qkv.sharding
    stept = jax.jit(model.train_step)
    for b in batches:
        st, mt = stept(st, mesh_lib.shard_batch(mesh, b))

    np.testing.assert_allclose(float(m1["train_loss/loss"]),
                               float(mt["train_loss/loss"]), rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(st.params))):
        np.testing.assert_allclose(a, b, atol=3e-4)


def test_composed_mesh_specs():
    """(data, fsdp, model) composed mesh: TP dims keep the `model` axis,
    the complementary kernel dim ZeRO-shards over `fsdp`, non-TP leaves
    fall back to FSDP over `fsdp`, and the batch shards over data x fsdp.
    eval_shape only — cheap."""
    from igm_tpu.parallel import mesh as mesh_lib

    model = _tiny_dit_ddpm()
    mesh = mesh_lib.make_mesh(data=2, model=2, fsdp=2)
    assert mesh.axis_names == ("data", "fsdp", "model")
    shapes = jax.eval_shape(model.init_state, jax.random.PRNGKey(0))
    shardings = mesh_lib.state_shardings(mesh, shapes, mode="tensor")

    import jax.tree_util as jtu
    flat = {jtu.keystr(p): s for p, s in jtu.tree_leaves_with_path(shardings)}

    def spec(substr):
        hits = [s.spec for k, s in flat.items() if substr in k]
        assert hits, f"no leaf path contains {substr!r}"
        return tuple(hits[0])

    # column-parallel kernel: out-features over model, in-features over fsdp
    assert spec("DiTBlock_0']['qkv']['kernel") == ("fsdp", "model")
    assert spec("DiTBlock_0']['Dense_0']['kernel") == ("fsdp", "model")
    # row-parallel MLP-down: in-features over model, out-features over fsdp
    assert spec("DiTBlock_0']['Dense_1']['kernel") == ("model", "fsdp")
    # the tiny proj (32x32 = 1024 elems) sits under FSDP_MIN_SIZE: TP dim
    # only, fsdp dim stays replicated — sharding tiny tensors trades an
    # all-gather dispatch for negligible memory
    assert spec("DiTBlock_0']['proj']['kernel") == ("model", None)
    # batch shards over BOTH data axes
    bsh = mesh_lib.batch_sharding(mesh)
    assert tuple(bsh.spec) == (("data", "fsdp"),)


@pytest.mark.slow
def test_composed_mesh_matches_single_device():
    """Two train steps on the composed (2,2,2) data x fsdp x tensor mesh
    match the single-device trajectory (all three parallelism modes in one
    jitted step, GSPMD-only collectives)."""
    from igm_tpu.parallel import mesh as mesh_lib

    model = _tiny_dit_ddpm()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(0, 255, (8, 16, 16, 1), dtype=np.uint8),
         np.zeros((8,), np.int32))
        for _ in range(2)
    ]

    s1 = jax.device_put(state, jax.devices()[0])
    step1 = jax.jit(model.train_step)
    for b in batches:
        s1, m1 = step1(s1, jax.device_put(b, jax.devices()[0]))

    mesh = mesh_lib.make_mesh(data=2, model=2, fsdp=2)
    st = mesh_lib.shard_state(mesh, state, mode="tensor")
    qkv = st.params["denoise"]["DiTBlock_0"]["qkv"]["kernel"]
    assert tuple(qkv.sharding.spec) == ("fsdp", "model")
    stept = jax.jit(model.train_step)
    for b in batches:
        st, mt = stept(st, mesh_lib.shard_batch(mesh, b))

    np.testing.assert_allclose(float(m1["train_loss/loss"]),
                               float(mt["train_loss/loss"]), rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(st.params))):
        np.testing.assert_allclose(a, b, atol=3e-4)


@pytest.mark.slow
def test_mesh_sharded_sampling_matches_single_device():
    """The ancestral sampling scan runs with the sample batch sharded over
    the mesh's data axes (multi-chip inference) and produces EXACTLY the
    single-device samples — sharding constraints change layout, not math."""
    from igm_tpu.parallel import mesh as mesh_lib

    model = _tiny_dit_ddpm()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    s1 = jax.device_put(state, jax.devices()[0])
    ref = jax.device_get(
        jax.jit(lambda s, r: model.sample(s, r, 16))(s1, jax.random.PRNGKey(7)))

    mesh = mesh_lib.make_mesh(data=4, model=2)
    st = mesh_lib.shard_state(mesh, state, mode="tensor")
    out = mesh_lib.sample_sharded(model, mesh, st, jax.random.PRNGKey(7), 16)
    assert "data" in str(out.sharding.spec)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(jax.device_get(out)),
                               atol=2e-4)


def _tiny_dit_ddpm_sp(mesh):
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 16, "height": 16, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm, hidden_dim=32, timesteps=8, network="dit",
                 depth=2, heads=2, patch=4, loss_type="l2",
                 compute_dtype="float32", sp_mesh=mesh)
    model.steps_per_epoch = 10
    return model


def test_sequence_parallel_matches_and_scatters():
    """Megatron-SP (networks/dit.py sp_mesh): the token-axis activation
    constraint composed with TP state sharding (a) keeps the training step
    numerically identical to single-device, and (b) actually changes the
    compiled collectives: TP block all-reduces are replaced by gather/
    scatter pairs at the GEMM boundaries (XLA:CPU lowers the scatter side
    without a literal reduce-scatter op, so the asserted signature is the
    all-gather/all-reduce mix shift vs the TP-only program — measured
    282 AR / 38 AG (TP) -> 92 AR / 221 AG (TP+SP) at this shape)."""
    import re
    from igm_tpu.parallel import mesh as mesh_lib

    base = _tiny_dit_ddpm()
    state = jax.jit(base.init_state)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = (rng.randint(0, 255, size=(8, 16, 16, 1), dtype=np.uint8),
             np.zeros((8,), np.int32))

    s1 = jax.device_put(state, jax.devices()[0])
    _, m1 = jax.jit(base.train_step)(s1, jax.device_put(batch, jax.devices()[0]))

    mesh = mesh_lib.make_mesh(data=2, model=4)
    sp = _tiny_dit_ddpm_sp(mesh)
    # init on the SP model wires its optimizer set; the param tree (and
    # values, same seed) is identical — sp only adds a layout constraint
    sp_state = jax.jit(sp.init_state)(jax.random.PRNGKey(0))
    st = mesh_lib.shard_state(mesh, sp_state, mode="tensor")
    step = jax.jit(sp.train_step)
    hlo_sp = step.lower(st, mesh_lib.shard_batch(mesh, batch)).compile().as_text()
    st_tp = mesh_lib.shard_state(mesh, state, mode="tensor")
    hlo_tp = jax.jit(base.train_step).lower(
        st_tp, mesh_lib.shard_batch(mesh, batch)).compile().as_text()

    def count(hlo, op):
        return len(re.findall(op, hlo))
    assert count(hlo_sp, "all-gather") > 2 * count(hlo_tp, "all-gather"), \
        "SP signature missing: no extra gather at GEMM boundaries"
    assert count(hlo_sp, "all-reduce") < count(hlo_tp, "all-reduce"), \
        "SP signature missing: TP all-reduces not replaced"
    _, msp = step(st, mesh_lib.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m1["train_loss/loss"]),
                               float(msp["train_loss/loss"]), rtol=1e-5)


def test_sp_mesh_requires_model_axis():
    from igm_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()  # 1-D data mesh, no model axis
    sp = _tiny_dit_ddpm_sp(mesh)
    state = jax.jit(sp.init_state)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = (rng.randint(0, 255, size=(8, 16, 16, 1), dtype=np.uint8),
             np.zeros((8,), np.int32))
    with pytest.raises(ValueError, match="model"):
        jax.jit(sp.train_step)(state, batch)
