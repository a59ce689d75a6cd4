"""Optimizers and schedules: torch-formula parity and group behavior."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.runtime.optim import (
    EpochOptimizer,
    MultiGroupOptimizer,
    build_lr_schedule,
)


def _cfg(**kw):
    base = dict(
        name="adamw", lr=0.01, max_epoch=10, lr_scheduler="cosine",
        warmup_epoch=0, warmup_type="constant", warmup_cons_lr=1e-5,
        weight_decay=0.0, momentum=0.9, betas=(0.9, 0.999),
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_cosine_schedule_matches_torch_formula():
    sched = build_lr_schedule(_cfg())
    for e in range(11):
        expected = 0.01 * (1 + np.cos(np.pi * e / 10)) / 2
        assert sched(e) == pytest.approx(expected)


def test_step_multistep_exponential_linear_constant():
    s = build_lr_schedule(_cfg(lr_scheduler="step", max_epoch=9))
    assert s(0) == 0.01 and s(3) == pytest.approx(0.001) and s(6) == pytest.approx(1e-4)
    s = build_lr_schedule(_cfg(lr_scheduler="multistep", max_epoch=10))
    assert s(4) == 0.01 and s(5) == pytest.approx(0.001)
    assert s(7) == pytest.approx(1e-4)
    s = build_lr_schedule(_cfg(lr_scheduler="exponential"))
    assert s(2) == pytest.approx(0.01 * 0.95**2)
    s = build_lr_schedule(_cfg(lr_scheduler="linear", max_epoch=10))
    assert s(5) == pytest.approx(0.005)
    s = build_lr_schedule(_cfg(lr_scheduler="constant"))
    assert s(7) == 0.01


def test_warmup():
    """Reference WarmupWrapper semantics (ref: utils/optimization.py:283-341,
    stepped after each epoch): epoch 0 runs at BASE lr, epochs
    1..warmup_epochs-1 at the warmup lr, and the inner scheduler's counter
    only starts advancing once warmup ends."""
    s = build_lr_schedule(_cfg(warmup_epoch=2), warmup=True)
    assert s(0) == pytest.approx(0.01)  # pre-step epoch 0 = base lr
    assert s(1) == pytest.approx(1e-5)
    # first post-warmup epoch = inner cosine stepped ONCE
    assert s(2) == pytest.approx(0.01 * (1 + np.cos(np.pi * 1 / 10)) / 2)
    assert s(3) == pytest.approx(0.01 * (1 + np.cos(np.pi * 2 / 10)) / 2)


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "muon"])
def test_optimizer_steps(name):
    opt = EpochOptimizer(_cfg(name=name, weight_decay=0.01))
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    updates, state = opt.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    # params moved opposite to the gradient
    assert float(new["w"][0, 0]) < 1.0
    assert np.isfinite(np.asarray(jax.tree.leaves(new)[0])).all()


def test_adam_vs_adamw_weight_decay_semantics():
    """torch 'adam' couples decay into the grad; 'adamw' decouples it. With a
    zero gradient, adam's first update is ~-lr*sign(p) (decay drives the
    moment), while adamw still shrinks p directly."""
    params = {"w": jnp.full((2, 2), 10.0)}
    zero_g = {"w": jnp.zeros((2, 2))}
    adam = EpochOptimizer(_cfg(name="adam", weight_decay=0.1, lr_scheduler="constant"))
    sa = adam.init(params)
    ua, _ = adam.update(zero_g, sa, params)
    adamw = EpochOptimizer(_cfg(name="adamw", weight_decay=0.1, lr_scheduler="constant"))
    sw = adamw.init(params)
    uw, _ = adamw.update(zero_g, sw, params)
    assert float(ua["w"][0, 0]) < 0  # coupled decay flows through adam moments
    assert float(uw["w"][0, 0]) == pytest.approx(-0.01 * 0.1 * 10.0)


def test_multigroup_lrs_and_frozen():
    def label_fn(params):
        return {"a": "base", "b": "gp", "c": "frozen"}

    opt = MultiGroupOptimizer(_cfg(), {"base": 0.01, "gp": 0.001, "frozen": None},
                              label_fn)
    params = {"a": jnp.ones(3), "b": jnp.ones(3), "c": jnp.ones(3)}
    state = opt.init(params)
    grads = {"a": jnp.ones(3), "b": jnp.ones(3), "c": jnp.ones(3)}
    updates, state = opt.update(grads, state, params)
    assert float(jnp.abs(updates["c"]).sum()) == 0.0  # frozen group
    assert float(jnp.abs(updates["a"]).sum()) > 0
    state = opt.set_epoch(state, 5)
    assert opt.current_lrs["base"] == pytest.approx(0.005)
    assert opt.current_lrs["gp"] == pytest.approx(0.0005)
    updates, state = opt.update(grads, state, params)
    assert float(jnp.abs(updates["c"]).sum()) == 0.0
