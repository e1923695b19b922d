"""Name-driven factory tests (util_implement.py behavior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sepreformer_tpu.config import get_variant
from sepreformer_tpu.engine.factories import (
    make_criterions,
    make_lr_controller,
    make_optimizer_by_name,
)


@pytest.fixture(scope="module")
def cfg():
    return get_variant("SepReformer_Base_WSJ0")


@pytest.mark.parametrize("name", ["AdamW", "Adam", "SGD"])
def test_optimizer_by_name_steps(cfg, name):
    tx = make_optimizer_by_name(cfg, name, weight_decay=1e-2, momentum=0.9)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    updates, _ = tx.update(grads, state, params)
    assert jnp.isfinite(updates["w"]).all()


def test_optimizer_unknown_name(cfg):
    with pytest.raises(KeyError):
        make_optimizer_by_name(cfg, "Lion")


def test_criterions_fixed_order(cfg):
    crits = make_criterions(cfg)
    assert list(crits) == [
        "PIT_SISNR_mag", "PIT_SISNR_time", "PIT_SISNRi", "PIT_SDRi",
    ]
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 1, 2048)), jnp.float32)
    est = src + 0.1
    assert np.isfinite(float(crits["PIT_SISNR_time"](est, src)))
    assert np.isfinite(float(crits["PIT_SISNR_mag"](est, src)))


def test_lr_controller_factory(cfg):
    ctl = make_lr_controller(cfg)
    assert ctl.lr == 0.0  # warmup active
    ctl_no_warmup = make_lr_controller(cfg, names=("ReduceLROnPlateau",))
    assert ctl_no_warmup.lr == cfg.optim.lr
    with pytest.raises(KeyError):
        make_lr_controller(cfg, names=("CosineAnnealing",))
