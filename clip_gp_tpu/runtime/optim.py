"""Optimizers and LR schedules on optax, with torch-parity semantics.

Covers the reference's surface (ref: utils/optimization.py): sgd / adam /
adamw / muon optimizers, cosine / step / multistep / exponential / constant /
linear epoch-level schedules, optional constant/linear warmup, and multi-rate
parameter groups (base vs GP).

Torch-parity notes:
- "adam" couples weight decay into the gradient (L2), "adamw" decouples it;
- schedules step per *epoch* (the reference calls ``sched.step()`` in
  ``after_epoch``), so the schedule is a function of epoch index and the
  current lr is injected per-epoch via ``optax.inject_hyperparams``;
- "muon" orthogonalizes ≥2-D updates via Newton–Schulz (optax.contrib.muon),
  with AdamW handling <2-D params — mirroring MuonWithAuxAdam, minus the
  vestigial single-process torch.distributed group the reference spins up
  (ref: utils/optimization.py:29-54), which has no TPU equivalent or purpose.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import optax


def _opt(config, name, default):
    """Scheduler knob with the reference's derived default: the config field
    may be absent OR None (OptimConfig declares Optional knobs as None =
    "derive", matching the reference's getattr defaults at
    utils/optimization.py:232-276)."""
    v = getattr(config, name, None)
    return default if v is None else v


def build_lr_schedule(config, warmup: bool = False) -> Callable[[int], float]:
    """Return epoch → lr, mirroring build_lr_scheduler semantics
    (ref: utils/optimization.py:218-280, 283-369)."""
    name = str(getattr(config, "lr_scheduler", "constant")).lower()
    base_lr = float(config.lr)
    max_epoch = int(config.max_epoch)

    if name == "cosine":
        eta_min = float(_opt(config, "eta_min", 0.0))

        def sched(e):
            return eta_min + (base_lr - eta_min) * (
                1 + math.cos(math.pi * min(e, max_epoch) / max(max_epoch, 1))
            ) / 2

    elif name == "step":
        step_size = int(_opt(config, "step_size", max(max_epoch // 3, 1)))
        gamma = float(_opt(config, "gamma", 0.1))

        def sched(e):
            return base_lr * gamma ** (e // step_size)

    elif name == "multistep":
        milestones = list(
            _opt(config, "milestones", [max_epoch // 2, max_epoch * 3 // 4])
        )
        gamma = float(_opt(config, "gamma", 0.1))

        def sched(e):
            return base_lr * gamma ** sum(1 for m in milestones if e >= m)

    elif name == "exponential":
        gamma = float(_opt(config, "gamma", 0.95))

        def sched(e):
            return base_lr * gamma**e

    elif name == "constant":

        def sched(e):
            return base_lr

    elif name == "linear":
        start = float(_opt(config, "start_factor", 1.0))
        end = float(_opt(config, "end_factor", 0.0))
        total = int(_opt(config, "total_iters", max_epoch))

        def sched(e):
            t = min(e, total) / max(total, 1)
            return base_lr * (start + (end - start) * t)

    else:
        raise ValueError(f"Unsupported scheduler: {name}")

    if not warmup or int(getattr(config, "warmup_epoch", 0)) <= 0:
        return sched

    warmup_epochs = int(config.warmup_epoch)
    warmup_type = str(getattr(config, "warmup_type", "constant")).lower()
    warmup_factor = float(getattr(config, "warmup_cons_lr", 1e-5)) / base_lr

    def with_warmup(e):
        # reference WarmupWrapper INTENT (ref: utils/optimization.py:
        # 283-341, stepped AFTER each epoch): epoch 0 runs at BASE lr
        # (before any step), epochs 1..warmup_epochs-1 at the warmup factor,
        # and the inner scheduler only starts advancing once warmup ends —
        # post-warmup epoch e runs at sched(e - warmup_epochs + 1).
        # KNOWN DIVERGENCE from the torch-EXECUTED wrapper for
        # warmup_epoch >= 2: torch's _warmup_step mutates group['lr'] and
        # every torch scheduler's get_lr chains off the CURRENT group lr, so
        # the executed first post-warmup epoch continues annealing from the
        # warmup lr (e.g. 1e-5) and never returns to base. That executed
        # behavior is almost certainly a bug (the run would train at ~0 lr
        # forever); neither repo wires warmup into any trainer, so this
        # resume-the-base-trajectory reading is the documented choice.
        if e == 0:
            return base_lr
        if e < warmup_epochs:
            if warmup_type == "constant":
                return base_lr * warmup_factor
            return base_lr * (warmup_factor + (1 - warmup_factor) * e / warmup_epochs)
        return sched(e - warmup_epochs + 1)

    return with_warmup


def _core_transform(config) -> optax.GradientTransformation:
    name = str(config.name).lower()
    wd = float(getattr(config, "weight_decay", 0.0))
    betas = tuple(getattr(config, "betas", (0.9, 0.999)))
    eps = float(getattr(config, "eps", 1e-8))

    if name == "sgd":
        momentum = float(getattr(config, "momentum", 0.9))
        nesterov = bool(getattr(config, "nesterov", False))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch coupled L2
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        return optax.chain(*parts) if parts else optax.identity()
    if name == "adam":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch Adam: L2 in grad
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        return optax.chain(*parts)
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(wd),  # decoupled
        )
    raise ValueError(f"Unsupported optimizer: {name}")


def _tx_factory(config) -> Callable[[float], optax.GradientTransformation]:
    """learning-rate → full transform. Muon is special-cased: optax.contrib.muon
    already implements the 2-D→Newton-Schulz / rest→Adam partition with its own
    lr handling (the MuonWithAuxAdam split, ref: utils/optimization.py:105-141)."""
    name = str(config.name).lower()
    if name == "muon":
        wd = float(getattr(config, "weight_decay", 0.0))
        betas = tuple(getattr(config, "betas", (0.9, 0.999)))
        eps = float(getattr(config, "eps", 1e-8))
        return lambda learning_rate: optax.contrib.muon(
            learning_rate,
            weight_decay=wd,
            adam_b1=betas[0],
            adam_b2=betas[1],
            adam_weight_decay=wd,
        )
    return lambda learning_rate: optax.chain(
        _core_transform(config),
        optax.scale_by_learning_rate(learning_rate),
    )


class EpochOptimizer:
    """Optax optimizer with a host-side per-epoch lr schedule.

    ``set_epoch`` must be called at each epoch boundary (the analog of
    ``sched.step()``); the update function itself is jit-friendly.
    """

    def __init__(self, config, warmup: bool = False):
        self.schedule = build_lr_schedule(config, warmup=warmup)
        self._tx = optax.inject_hyperparams(_tx_factory(config))(
            learning_rate=self.schedule(0)
        )
        self.current_lr = self.schedule(0)

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, state, params):
        return self._tx.update(grads, state, params)

    def set_epoch(self, state, epoch: int):
        self.current_lr = self.schedule(epoch)
        state.hyperparams["learning_rate"] = jax.numpy.asarray(
            self.current_lr, dtype=jax.numpy.float32
        )
        return state


class MultiGroupOptimizer:
    """Two-rate optimizer (base params vs GP params) over one pytree.

    The analog of build_optimizer_from_param_groups
    (ref: utils/optimization.py:147-…; ref: trainers/adapter.py:298-311):
    a label function assigns each leaf to a group; each group has its own lr
    schedule over a shared transform family.
    """

    def __init__(self, config, group_lrs: Dict[str, Optional[float]], label_fn):
        self.label_fn = label_fn
        self.schedules = {}
        self.group_names = [g for g, lr in group_lrs.items() if lr is not None]
        transforms: Dict[str, Any] = {}
        for group, lr in group_lrs.items():
            if lr is None:  # frozen group: updates forced to zero
                transforms[group] = optax.set_to_zero()
                continue
            gcfg = _OverrideLr(config, lr)
            self.schedules[group] = build_lr_schedule(gcfg)
            transforms[group] = optax.inject_hyperparams(_tx_factory(gcfg))(
                learning_rate=self.schedules[group](0)
            )
        self._tx = optax.multi_transform(transforms, label_fn)
        self.current_lrs = {g: self.schedules[g](0) for g in self.group_names}

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, state, params):
        return self._tx.update(grads, state, params)

    def set_epoch(self, state, epoch: int):
        for group in self.group_names:
            lr = self.schedules[group](epoch)
            self.current_lrs[group] = lr
            state.inner_states[group].inner_state.hyperparams[
                "learning_rate"
            ] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
        return state


class _OverrideLr:
    """Config view with a different base lr (param-group override)."""

    def __init__(self, config, lr: float):
        self._config = config
        self.lr = lr

    def __getattr__(self, item):
        return getattr(self._config, item)
