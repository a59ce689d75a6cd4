#!/usr/bin/env python3
"""CoCoOp single-chip step PROFILE at the worst measured shape (K=100).

Round-4 verdict #4: the K=100 cell costs 459 s cold and dominates the
config-#4 suite — produce a phase breakdown (compile vs differentiated
tower fwd/bwd vs eval) and then attack the largest slice. This script
drives the TRAINER'S OWN jitted fns (no re-implementation to drift) and
reports, per prompt-tower dtype (fp32 = reference-parity default, bf16 =
MXU-native mixed precision, CLIP_GP_TPU_PROMPT_TOWER_DTYPE):

- step_compile_s: first _train_step call (trace + XLA compile + run)
- step_ms: warm train step (tower fwd+bwd + meta-net/ctx update)
- fwd_ms: forward-only conditional logits at the train shape (so
  bwd_ms ≈ step_ms − fwd_ms is the backward+update slice)
- eval_ms_per_1k_rows: forward eval logits throughput

Prints one JSON object (not the driver contract — bench.py is the
headline). Run alone on the bench host.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

import jax  # noqa: E402

from clip_gp_tpu.runtime import compile_cache  # noqa: E402

compile_cache.enable()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = int(os.environ.get("BENCH_COCOOP_K", "100"))
B = int(os.environ.get("BENCH_COCOOP_B", "32"))
STEPS = int(os.environ.get("BENCH_COCOOP_STEPS", "10"))
EVAL_ROWS = 512


def make_trainer():
    import types

    import clip_gp_tpu.methods.cocoop as cocoop_mod
    from clip_gp_tpu.core.config import Config

    config = Config()
    config.model.backbone_name = "ViT-B/16"
    config.adapter.n_ctx = 4
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


def profile_dtype(dtype_name, feats, labels, eval_feats):
    os.environ["CLIP_GP_TPU_PROMPT_TOWER_DTYPE"] = dtype_name
    # fresh trainer per dtype: the env is read at trace time, and a new
    # build_model re-traces everything
    import clip_gp_tpu.methods.cocoop as cocoop_mod

    trainer = make_trainer()
    trainer.build_model()
    params, opt_state = trainer.params, trainer.opt_state
    step = trainer._train_step

    t0 = time.perf_counter()
    params, opt_state, loss, _ = step(params, opt_state, feats, labels)
    float(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss, _ = step(params, opt_state, feats, labels)
    float(loss)
    step_ms = (time.perf_counter() - t0) / STEPS * 1000

    # forward-only at the SAME train shape: bwd+update ≈ step − fwd
    arch, clip_params = trainer.arch, trainer._clip_params
    text_params = {
        k: clip_params[k]
        for k in ("pos_embed", "transformer", "ln_final", "text_projection")
    }

    # prompt parts/weights are explicit jit ARGUMENTS (closure leaves bake
    # into the HLO as constants — CLAUDE.md hard rule; the first version of
    # this bench closed over them and measured a 22x phantom on the fp32
    # forward)
    @jax.jit
    def fwd_fn(text_params, params, f, prefix, suffix, eot):
        return cocoop_mod.conditional_logits(
            text_params, arch, params, f, prefix, suffix, eot, K,
            trainer.logit_scale,
        )

    eot_j = jnp.asarray(trainer.tokenized.argmax(axis=-1))

    def fwd(params, f):
        return fwd_fn(text_params, params, f, trainer.token_prefix,
                      trainer.token_suffix, eot_j)

    out = fwd(params, feats)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    f = feats
    for _ in range(STEPS):
        out = fwd(params, f)
        # dependency chain: derive the next input from this output
        f = feats + 1e-6 * jnp.tanh(out[:, :1])
    jax.block_until_ready(out)
    fwd_ms = (time.perf_counter() - t0) / STEPS * 1000

    # eval throughput at a row chunk
    ev = fwd(params, eval_feats[:B])  # reuse compiled shape? different rows
    jax.block_until_ready(ev)
    t0 = time.perf_counter()
    reps = max(1, EVAL_ROWS // B)
    f = eval_feats[:B]
    for _ in range(reps):
        ev = fwd(params, f)
        f = eval_feats[:B] + 1e-6 * jnp.tanh(ev[:, :1])
    jax.block_until_ready(ev)
    eval_ms_per_1k = (time.perf_counter() - t0) / (reps * B) * 1000 * 1000

    return {
        "step_compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 1),
        "fwd_ms": round(fwd_ms, 1),
        "bwd_update_ms": round(step_ms - fwd_ms, 1),
        "eval_ms_per_1k_rows": round(eval_ms_per_1k, 1),
        "final_loss": float(loss),
    }


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    rng = np.random.default_rng(0)
    d = 512
    feats = rng.normal(size=(B, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.asarray(feats)
    labels = jnp.asarray(rng.integers(0, K, size=B).astype(np.int32))
    eval_feats = jnp.asarray(
        rng.normal(size=(EVAL_ROWS, d)).astype(np.float32)
    )

    out = {
        "shape": f"K={K} B={B} ViT-B/16 text tower",
        "backend": jax.default_backend(),
        "fp32": profile_dtype("float32", feats, labels, eval_feats),
        "bf16": profile_dtype("bf16", feats, labels, eval_feats),
    }
    out["bf16_step_speedup"] = round(
        out["fp32"]["step_ms"] / out["bf16"]["step_ms"], 2
    )
    print(json.dumps(out))
    (Path(__file__).resolve().parents[1] / "BENCH_cocoop_profile.json"
     ).write_text(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
