"""MADE bf16 weight storage + stochastic rounding (round 4).

The MADE step is HBM-bound on the 1024x200704 output layer
(docs/MFU_AR.md); ``weight_dtype=bfloat16`` stores that kernel in bf16
with stochastic-rounded updates (core/optim.apply_updates_sr).  These
tests pin the SR math and the trained-trajectory equivalence; the on-chip
throughput A/B lives in benchmarks/made_wdtype_ab.py.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.models.made import MADE  # noqa: E402


def _dm(h, w):
    return {"width": w, "height": h, "channels": 1,
            "transforms": {"normalize": True}}


def test_stochastic_round_bf16_unbiased():
    """SR to bf16 is unbiased: rounds to one of the two bf16 neighbours
    with probability proportional to proximity (round-to-nearest would pin
    every copy to the same neighbour), and exact bf16 values pass
    through."""
    import jax
    import jax.numpy as jnp

    from igm_tpu.core.optim import stochastic_round_bf16

    x = jnp.full((1 << 16,), 1.0 + 1e-4, jnp.float32)  # between bf16 ulps
    r = stochastic_round_bf16(x, jax.random.PRNGKey(0)).astype(jnp.float32)
    ulp = 0.0078125  # bf16 ulp at 1.0
    assert set(map(float, jnp.unique(r))) <= {1.0, 1.0 + ulp}
    frac_up = float((r > 1.0).mean())
    assert abs(frac_up - 1e-4 / ulp) < 3e-3, frac_up
    # exact bf16 values are untouched
    e = jnp.asarray([0.5, -2.0, 0.0, 1.0], jnp.float32)
    re = stochastic_round_bf16(e, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(re, np.float32), np.asarray(e))


def test_made_bf16_weight_storage_trains():
    """weight_dtype=bfloat16: the output kernel is STORED bf16, the masked
    invariant holds, SR updates move the loss, and the bpd trajectory stays
    close to the f32 arm over 30 tiny steps."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (8, 8, 8, 1), dtype=np.uint8),
             np.zeros((8,), np.int32))

    def run(wdtype):
        model = MADE(datamodule=_dm(8, 8), hidden_dim=64, n_layer=2,
                     compute_dtype="bfloat16", weight_dtype=wdtype)
        model.steps_per_epoch = 10
        state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
        step = jax.jit(model.train_step)
        traj = []
        for _ in range(30):
            state, m = step(state, batch)
            traj.append(float(m["train_bpd"]))
        return model, state, traj

    model_b, state_b, traj_b = run("bfloat16")
    kernel = state_b.params["net"]["out_layer"]["kernel"]
    assert kernel.dtype == jnp.bfloat16
    _, _, traj_f = run("float32")
    assert traj_b[-1] < traj_b[0]  # SR updates actually train
    assert abs(traj_b[-1] - traj_f[-1]) < 0.1, (traj_b[-1], traj_f[-1])
    # masked-kernel invariant survives SR updates (causality)
    from igm_tpu.models.made import build_masks
    hp = model_b.hparams
    _, out_small = build_masks(model_b.in_dim, hp.hidden_dim, hp.n_layer,
                               seed=0)
    expanded = np.repeat(out_small.T, 256, axis=1)  # (hidden, D*256)
    k = np.asarray(kernel, np.float32)
    assert (k[expanded == 0] == 0).all()
