"""Ingest reference-framework checkpoints (``model.pth.tar-*``).

The reference saves ``{"state_dict": model.state_dict(), "epoch": e+1,
"optimizer": ..., "scheduler": ...}`` with torch under
``<run>/adapter/model.pth.tar-<epoch>`` (ref: utils/trainer.py:347-374) and
resolves ``model-best.pth.tar`` → highest-numbered on load (ref:
utils/trainer.py:376-399). This module converts those artifacts onto our
trainable pytrees so ``train.py --eval-only --model-dir <reference run>``
evaluates a reference-trained model directly — the cheapest route to
trained-state parity evidence (run the same artifact through both
frameworks and diff metrics.json).

Scope and semantics:

- The encoder towers inside the state dict are ignored: every reference
  trainer freezes ``image_encoder``/``text_encoder``/``logit_scale``
  (requires_grad=False, ref: trainers/adapter.py:280-290), so those weights
  equal the pretrained CLIP checkpoint both frameworks already load.
- GP runs: the variational state lives in the checkpoint's own PCA basis
  (torch SVD — column signs differ from our numpy SVD), so the GP buffers
  are taken from the checkpoint too. ``_pca_W``/``_pca_mean`` are plain
  attributes in the reference (NOT saved, ref:
  trainers/gp_template_weigher.py:36-37); they are reconstructed exactly
  from the saved ``_templates``/``_templates_red`` buffers — μ is the mean
  over all K·M template embeddings (ref:32-35) and W solves
  ``(X−μ)·W = templates_red``, which is exact because W's columns (right
  singular vectors) lie in the row space of ``X−μ``.
- Tip-Adapter: the reference NEVER saves one — its trainer leaves
  ``self.model``/``self.optim`` unset so ``save_model`` returns immediately
  (ref: utils/trainer.py:348-350, trainers/tip_adapter.py) — so there is no
  artifact to ingest; a clear error says so.
- Optimizer/scheduler state is not converted (torch moment tensors don't
  map onto optax leaves one-to-one); resuming TRAINING from a reference
  checkpoint restarts the optimizer. Eval-only — the intended use — is
  unaffected.
- Reference checkpoints carry no classnames, so the cross-dataset row
  remap (runtime/checkpoint.py) is unavailable for them; evaluate on the
  training vocabulary.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

REF_CKPT_GLOB = "model.pth.tar-*"


def resolve_reference_checkpoint_path(
    model_dir: str, epoch: Optional[int] = None
) -> Optional[Path]:
    """Reference-format discovery: explicit epoch, else model-best, else
    highest-numbered (ref: utils/trainer.py:376-399). None if absent."""
    adapter_dir = Path(model_dir) / "adapter"
    if epoch is not None:
        path = adapter_dir / f"model.pth.tar-{epoch}"
        return path if path.exists() else None
    best = adapter_dir / "model-best.pth.tar"
    if best.exists():
        return best
    cands = sorted(
        adapter_dir.glob(REF_CKPT_GLOB),
        key=lambda p: int(p.name.split("-")[-1]),
    )
    return cands[-1] if cands else None


def _np(t) -> np.ndarray:
    return t.detach().cpu().float().numpy()


def _require(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(
            f"reference checkpoint is missing {key!r} — was it saved by a "
            "different trainer than this config's?"
        )
    return sd[key]


def _convert_adapter(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Adapter CustomCLIP (ref: trainers/adapter.py:145-198): visual_proj +
    one of {GP weighter, template-weight logits, linear weighting head}."""
    state: Dict[str, Any] = {"visual_proj": _require(sd, "visual_proj.weight")}
    extra: Dict[str, Any] = {}
    g = "gp_weighter."
    if g + "variational_strategy._variational_distribution.variational_mean" in sd:
        templates = _require(sd, g + "_templates")  # [K,M,D]
        templates_red = _require(sd, g + "_templates_red")  # [K,M,d]
        m = templates.shape[1]
        gp: Dict[str, Any] = {
            "inducing_token": _require(
                sd, g + "variational_strategy.inducing_points"
            )[:, m:, :],
            "variational_mean": sd[
                g + "variational_strategy._variational_distribution.variational_mean"
            ],
            "chol_variational_covar": _require(
                sd,
                g
                + "variational_strategy._variational_distribution.chol_variational_covar",
            ),
            "cls_bias": _require(sd, g + "mean_module.cls_bias"),
            "tmp_bias": _require(sd, g + "mean_module.tmp_bias"),
            # unused-in-forward parity parameter (ref:68-70); stored verbatim
            "A": _require(sd, g + "A.weight"),
        }
        if g + "covar_module.base_kernel.raw_lengthscale" in sd:  # rbf+scale
            gp["raw_lengthscale"] = sd[g + "covar_module.base_kernel.raw_lengthscale"]
            gp["raw_outputscale"] = _require(sd, g + "covar_module.raw_outputscale")
        elif g + "covar_module.raw_lengthscale" in sd:  # matern ν=½
            gp["raw_lengthscale"] = sd[g + "covar_module.raw_lengthscale"]
        elif g + "covar_module.raw_variance" in sd:  # linear
            gp["raw_variance"] = sd[g + "covar_module.raw_variance"][:, 0]
        else:
            raise KeyError(
                "reference GP checkpoint has no recognizable kernel "
                "parameters under gp_weighter.covar_module.*"
            )
        state["gp"] = gp

        # Reconstruct the unsaved PCA map from the saved buffers (see module
        # docstring). A plain lstsq amplifies the buffers' float32 noise by
        # the centered Gram's condition number (measured 5.7e-3 projection
        # error on a tiny fixture); instead: recompute the principal
        # subspace V by fp64 SVD, then align it to the checkpoint's basis
        # with an orthogonal Procrustes rotation R = argmin‖(X−μ)VR − Y‖ —
        # both factors are orthonormal, so no small-singular-value
        # amplification (residual is fp32 noise only).
        d_full = templates.shape[-1]
        d_red = templates_red.shape[-1]
        x = templates.reshape(-1, d_full).astype(np.float64)
        mu = x.mean(axis=0)
        xc = x - mu
        y = templates_red.reshape(-1, d_red).astype(np.float64)
        v = np.linalg.svd(xc, full_matrices=False)[2][:d_red].T  # [D,d]
        z = xc @ v
        u_s, _, vt_s = np.linalg.svd(z.T @ y)
        w = v @ (u_s @ vt_s)
        extra["gp_buffers"] = {
            "templates": templates,
            "templates_red": templates_red,
            "pca_mean": mu.astype(np.float32),
            "pca_W": w.astype(np.float32),
            "f0": _require(sd, g + "mean_module.f0"),
        }
    elif "template_weights" in sd:
        state["template_logits"] = sd["template_weights"]
    elif "template_weight_linear.weight" in sd:
        # torch Linear weight [1,D] → our [D,1] column
        state["template_weight_linear"] = sd["template_weight_linear.weight"].T
    return state, extra


def _convert_clip_adapter(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """CLIP-Adapter (ref: trainers/clip_adapter.py:16-70): bottleneck MLP +
    the classifier buffer (which the GP pre-stage overwrote in-place with
    MC-mean prototypes, ref:286-290 — so GP runs convert through it too)."""
    return (
        {
            "adapter": {
                "fc1": _require(sd, "adapter.fc1.weight").T,
                "fc2": _require(sd, "adapter.fc2.weight").T,
            },
            "clip_weights": _require(sd, "clip_weights"),
        },
        {},
    )


def _convert_taskres(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """TaskRes (ref: trainers/taskres.py:35-47): frozen base text features
    (buffer — carries the GP/enhanced-base variants too) + residuals."""
    return (
        {
            "residuals": _require(
                sd, "taskres_learner.text_feature_residuals"
            ),
            "base_text_features": _require(
                sd, "taskres_learner.base_text_features"
            ),
        },
        {},
    )


def _convert_coop(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """CoOp (ref: trainers/adapter_coop.py:14-63): the learnable context
    ([n_ctx,dim] shared or [K,n_ctx,dim] csc); prefix/suffix/tokenized
    buffers are rebuilt deterministically from classnames + CLIP weights."""
    return {"ctx": _require(sd, "prompt_learner.ctx")}, {}


def _convert_cocoop(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """CoCoOp (ref: trainers/adapter_cocoop.py:14-60): ctx + 2-layer
    meta-net (torch Linear [out,in] → our [in,out])."""
    p = "prompt_learner."
    return (
        {
            "ctx": _require(sd, p + "ctx"),
            "meta_fc1": {
                "w": _require(sd, p + "meta_net.0.weight").T,
                "b": _require(sd, p + "meta_net.0.bias"),
            },
            "meta_fc2": {
                "w": _require(sd, p + "meta_net.2.weight").T,
                "b": _require(sd, p + "meta_net.2.bias"),
            },
        },
        {},
    )


_CONVERTERS = {
    "Adapter": _convert_adapter,
    "CLIP-Adapter": _convert_clip_adapter,
    "Adapter-CLIP-Adapter": _convert_clip_adapter,
    "TaskRes": _convert_taskres,
    "Adapter-CoOp": _convert_coop,
    "CoOp": _convert_coop,
    "Adapter-CoCoOp": _convert_cocoop,
    "CoCoOp": _convert_cocoop,
}

_NEVER_SAVED = ("Tip-Adapter", "Adapter-TipA", "Adapter-TipA-F", "Tip-Adapter-F")


def convert_reference_checkpoint(
    path, trainer_name: str
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """(trainable_state, extra_state, epoch) from a reference checkpoint."""
    if trainer_name in _NEVER_SAVED:
        raise ValueError(
            f"{trainer_name}: the reference never saves Tip-Adapter "
            "checkpoints (its trainer leaves self.model unset, so "
            "save_model is a no-op — ref: utils/trainer.py:348-350); "
            "there is no artifact to ingest"
        )
    conv = _CONVERTERS.get(trainer_name)
    if conv is None:
        raise ValueError(
            f"no reference-checkpoint converter for trainer {trainer_name!r} "
            f"(supported: {sorted(_CONVERTERS)})"
        )
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {
        k: _np(v) for k, v in ckpt["state_dict"].items() if torch.is_tensor(v)
    }
    state, extra = conv(sd)
    return state, extra, int(ckpt.get("epoch", 0))
