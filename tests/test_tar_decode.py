"""KV-cached TAR decoding must match the full causal forward exactly."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_cached_decode_matches_full_forward():
    from igm_tpu.models.tar import TARNet

    n, h, w = 2, 3, 3
    s = 1 + h * w
    net = TARNet(n_tokens=2, d_model=16, nhead=2, num_layers=2, height=h,
                 width=w, class_cond=False, n_classes=1)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        np.concatenate([np.zeros((n, 1), np.int64),
                        rng.integers(0, 2, (n, s - 1))], axis=1), jnp.int32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, tokens,
                         train=False)
    params = variables["params"]

    full = net.apply({"params": params}, tokens, train=False)  # (N, S, 2)

    cache = net.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((n, s), jnp.int32), train=False, decode=True,
                     pos_idx=0)["cache"]
    step_logits = []
    for i in range(s):
        tok_i = tokens[:, i:i + 1]
        logits, upd = net.apply({"params": params, "cache": cache}, tok_i,
                                train=False, decode=True, pos_idx=i,
                                mutable=["cache"])
        cache = upd["cache"]
        step_logits.append(np.asarray(logits[:, 0]))
    incremental = np.stack(step_logits, axis=1)  # (N, S, 2)

    np.testing.assert_allclose(incremental, np.asarray(full), atol=1e-5)


def test_cached_sampler_end_to_end():
    """sample() runs through the scan-ed cached decoder and fills tokens."""
    from igm_tpu.config import to_node
    from igm_tpu.models.tar import TAR

    dm = to_node({"width": 4, "height": 4, "channels": 1, "n_classes": 10,
                  "transforms": {"convert": True, "normalize": True}})
    model = TAR(datamodule=dm, d_model=16, nhead=2, num_layers=1)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    imgs = model.sample(state, jax.random.PRNGKey(1), 3)
    assert imgs.shape == (3, 4, 4, 1)
    vals = np.unique(np.asarray(imgs))
    assert set(vals).issubset({0.0, 1.0})


def test_flash_attention_knob_safe_off_tpu():
    """model.flash_attention: on a non-TPU backend every setting must
    resolve to the XLA path (the Pallas kernel needs a TPU) with a loud
    warning for explicit opt-ins, and the model must still train."""
    from igm_tpu.models.tar import TAR

    dm = {"width": 4, "height": 4, "channels": 1,
          "transforms": {"normalize": False}, "n_classes": 10}
    for knob in ("auto", True, "eval", False):
        model = TAR(dm, d_model=16, nhead=2, num_layers=1,
                    flash_attention=knob)
        assert model.modules["net"].flash == "off", knob
    model = TAR(dm, d_model=16, nhead=2, num_layers=1)
    model.steps_per_epoch = 4
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.zeros((2, 4, 4, 1), jnp.uint8), jnp.zeros((2,), jnp.int32))
    state2, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_log/nll"]))
