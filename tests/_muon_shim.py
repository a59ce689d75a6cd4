"""Functional ``muon`` package shim: exactly the surface the reference
imports (``from muon import MuonWithAuxAdam``, ref:
utils/optimization.py:19-26), so its muon branch actually EXECUTES here
(the package is not installed — same pattern as tests/_gpytorch_shim.py).

Implements the public Muon algorithm (Keller Jordan,
github.com/KellerJordan/Muon): ≥2-D params take Newton–Schulz-orthogonalized
nesterov momentum (bfloat16 iteration, no bias correction, scale by
``max(1, rows/cols)**0.5``); <2-D params take bias-corrected Adam with eps
added after the sqrt; both with decoupled ``lr·wd`` decay applied as
``p *= (1 - lr·wd)`` before the update step.

Single-process semantics: the real package round-robins muon params over
``torch.distributed`` ranks and all_gathers them back — at world_size 1
(the reference's ``_ensure_single_process_distributed_initialized`` path,
ref: utils/optimization.py:29-54) every rank owns every param and the
all_gather is a self-copy, so the math below is identical and the process
group is unnecessary.
"""

from __future__ import annotations

import torch


def zeropower_via_newtonschulz5(g: torch.Tensor, steps: int) -> torch.Tensor:
    """Quintic Newton–Schulz iteration orthogonalizing ``g`` (public Muon
    numerics: bfloat16, transpose when rows > cols, Frobenius norm + 1e-7)."""
    assert g.ndim >= 2
    a, b, c = (3.4445, -4.7750, 2.0315)
    x = g.bfloat16()
    if g.size(-2) > g.size(-1):
        x = x.mT
    x = x / (x.norm(dim=(-2, -1), keepdim=True) + 1e-7)
    for _ in range(steps):
        xxt = x @ x.mT
        poly = b * xxt + c * xxt @ xxt
        x = a * x + poly @ x
    if g.size(-2) > g.size(-1):
        x = x.mT
    return x


def muon_update(grad, momentum, beta=0.95, ns_steps=5, nesterov=True):
    momentum.lerp_(grad, 1 - beta)
    update = grad.lerp_(momentum, beta) if nesterov else momentum
    if update.ndim == 4:  # conv filters: flatten to a matrix per filter bank
        update = update.view(len(update), -1)
    update = zeropower_via_newtonschulz5(update, steps=ns_steps)
    update *= max(1, grad.size(-2) / grad.size(-1)) ** 0.5
    return update


def adam_update(grad, buf1, buf2, step, betas, eps):
    buf1.lerp_(grad, 1 - betas[0])
    buf2.lerp_(grad.square(), 1 - betas[1])
    buf1c = buf1 / (1 - betas[0] ** step)
    buf2c = buf2 / (1 - betas[1] ** step)
    return buf1c / (buf2c.sqrt() + eps)


class MuonWithAuxAdam(torch.optim.Optimizer):
    """Muon for ≥2-D param groups (``use_muon=True``) + auxiliary Adam for
    the rest — the public package's combined optimizer, single-process."""

    def __init__(self, param_groups):
        for group in param_groups:
            assert "use_muon" in group
            if group["use_muon"]:
                group["lr"] = group.get("lr", 0.02)
                group["momentum"] = group.get("momentum", 0.95)
                group["weight_decay"] = group.get("weight_decay", 0)
                assert set(group.keys()) == {
                    "params", "lr", "momentum", "weight_decay", "use_muon"
                }
            else:
                group["lr"] = group.get("lr", 3e-4)
                group["betas"] = group.get("betas", (0.9, 0.95))
                group["eps"] = group.get("eps", 1e-10)
                group["weight_decay"] = group.get("weight_decay", 0)
                assert set(group.keys()) == {
                    "params", "lr", "betas", "eps", "weight_decay", "use_muon"
                }
        super().__init__(param_groups, dict())

    @torch.no_grad()
    def step(self, closure=None):
        loss = None
        if closure is not None:
            with torch.enable_grad():
                loss = closure()
        for group in self.param_groups:
            if group["use_muon"]:
                for p in group["params"]:
                    if p.grad is None:
                        p.grad = torch.zeros_like(p)
                    state = self.state[p]
                    if len(state) == 0:
                        state["momentum_buffer"] = torch.zeros_like(p)
                    update = muon_update(
                        p.grad, state["momentum_buffer"],
                        beta=group["momentum"],
                    )
                    p.mul_(1 - group["lr"] * group["weight_decay"])
                    p.add_(update.reshape(p.shape), alpha=-group["lr"])
            else:
                for p in group["params"]:
                    if p.grad is None:
                        p.grad = torch.zeros_like(p)
                    state = self.state[p]
                    if len(state) == 0:
                        state["exp_avg"] = torch.zeros_like(p)
                        state["exp_avg_sq"] = torch.zeros_like(p)
                        state["step"] = 0
                    state["step"] += 1
                    update = adam_update(
                        p.grad, state["exp_avg"], state["exp_avg_sq"],
                        state["step"], group["betas"], group["eps"],
                    )
                    p.mul_(1 - group["lr"] * group["weight_decay"])
                    p.add_(update, alpha=-group["lr"])
        return loss


def build_muon_module():
    """A module object exposing exactly the surface the reference imports."""
    import types

    mod = types.ModuleType("muon")
    mod.MuonWithAuxAdam = MuonWithAuxAdam
    mod.muon_update = muon_update
    mod.adam_update = adam_update
    mod.zeropower_via_newtonschulz5 = zeropower_via_newtonschulz5
    return mod
