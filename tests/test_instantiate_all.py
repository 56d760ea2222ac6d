"""Every experiment config must instantiate its datamodule AND model.

Much cheaper than full smoke training; catches signature/config drift across
the whole 55-experiment matrix (SURVEY.md §2 model x config matrix).
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import compose, instantiate  # noqa: E402

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
EXPERIMENTS = sorted(
    str(p.relative_to(CONFIG_DIR / "experiment")).removesuffix(".yaml")
    for p in (CONFIG_DIR / "experiment").rglob("*.yaml")
)


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_instantiate(experiment):
    cfg = compose(CONFIG_DIR, [f"experiment={experiment}",
                               "print_config=False"])
    dm = instantiate(cfg.datamodule)
    assert dm.batch_size > 0
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    # every model must expose the trainer contract
    for attr in ("init_state", "train_step", "validation_step", "modules"):
        assert hasattr(model, attr), f"{experiment}: missing {attr}"
    assert model.width == cfg.datamodule.width
