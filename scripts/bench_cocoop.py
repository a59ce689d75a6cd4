#!/usr/bin/env python3
"""CoCoOp step-time microbenchmark: blocked batched text encode vs the
chunked lax.map fallback.

The reference loops one image's K prompts at a time through the text tower
(ref: trainers/adapter_cocoop.py:70-82); round 1 chunked that into C·K-prompt
lax.map steps (budget 256 prompts); round 2 encodes the whole batch's B·K
prompts in ONE text-tower call when they fit PROMPT_BUDGET. This bench
measures a full CoCoOp train step (meta-net + ctx grads through the text
tower) at the flagship shape for both budgets — by driving the TRAINER'S OWN
``_build_jitted_fns``/``_train_step`` (no re-implementation to drift from the
shipped math).

Prints one JSON object (not the driver contract — bench.py is the headline).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

import jax

from clip_gp_tpu.runtime import compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np

import clip_gp_tpu.methods.cocoop as cocoop_mod
from clip_gp_tpu.core.config import Config

K = 100  # classes
B = 32  # batch
N_CTX = 4
STEPS = 10


def make_trainer():
    config = Config()
    config.model.backbone_name = "ViT-B/16"
    config.adapter.n_ctx = N_CTX
    config.adapter.ctx_init = ""
    config.seed = 1
    classnames = [f"thing {i}" for i in range(K)]
    dm = types.SimpleNamespace(
        dataset=types.SimpleNamespace(classnames=classnames),
        train_loader_x=None,
        val_loader=None,
        test_loader=None,
        num_classes=K,
        lab2cname={i: c for i, c in enumerate(classnames)},
    )
    return cocoop_mod.Trainer(config, dm)


def measure(budget, feats, labels):
    cocoop_mod.PROMPT_BUDGET = budget
    trainer = make_trainer()
    trainer.build_model()  # builds params + the real jitted step fns
    params, opt_state = trainer.params, trainer.opt_state
    step = trainer._train_step

    params, opt_state, loss, _ = step(params, opt_state, feats, labels)
    float(loss)  # compile + warmup, forced to completion
    # dependency chain: each step consumes the previous params/opt_state;
    # materializing the final loss forces genuine execution of all steps
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss, _ = step(params, opt_state, feats, labels)
    float(loss)
    return (time.perf_counter() - t0) / STEPS * 1000


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    rng = np.random.default_rng(0)
    d = 512  # ViT-B/16 embed dim
    feats = rng.normal(size=(B, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.asarray(feats)
    labels = jnp.asarray(rng.integers(0, K, size=B).astype(np.int32))

    default_budget = int(cocoop_mod.PROMPT_BUDGET)
    ms_default = measure(default_budget, feats, labels)
    ms_batched = measure(B * K, feats, labels)
    print(
        json.dumps(
            {
                f"cocoop_step_ms_default_budget{default_budget}": round(
                    ms_default, 1
                ),
                "cocoop_step_ms_fully_batched": round(ms_batched, 1),
                "batched_over_default_ratio": round(ms_batched / ms_default, 2),
                "shape": f"K={K} B={B} n_ctx={N_CTX} ViT-B/16 text tower",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
