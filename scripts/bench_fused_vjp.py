#!/usr/bin/env python3
"""Fused-block VJP benchmark: Pallas backward kernels vs the XLA-math VJP.

CoOp/CoCoOp differentiate through the text tower every training step. Round 2
paired the fast Pallas forward with an XLA-math VJP whose backward re-ran a
full XLA forward (so the differentiated path fell back to XLA end-to-end,
measured 700 ms XLA-only vs 1025 ms Pallas-forward+XLA-VJP). Round 3's
recompute-based Pallas backward kernels (ops/flash_attention.py:
_ln_attn_bwd_kernel / _ln_mlp_bwd_kernel) keep the [N,N] attention matrices
and the [T,4D] MLP hidden in VMEM in BOTH directions.

This bench times the exact differentiated program CoOp's vmapped group runs:
value_and_grad of a cosine-CE loss whose text features come from the full
remat'd text tower over T*K prompts, under CLIP_GP_TPU_FUSED_VJP=pallas vs
=xla (env is read at trace time, so each mode traces its own function).
Dependency-chain protocol: each step's ctx is updated from the previous
step's grads; the final ctx materializes (bench.py docstring — required on
the tunneled backend).

Prints one JSON line with per-step times and the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

if os.environ.get("CLIP_GP_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

T_TRIALS = int(os.environ.get("BENCH_VJP_TRIALS", "5"))
CLASSES = int(os.environ.get("BENCH_VJP_CLASSES", "100"))
N_CTX = int(os.environ.get("BENCH_VJP_NCTX", "16"))
STEPS = int(os.environ.get("BENCH_VJP_STEPS", "20"))
REPS = int(os.environ.get("BENCH_VJP_REPS", "3"))
BACKBONE = os.environ.get("BENCH_VJP_BACKBONE", "ViT-B/16")


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_gp_tpu.methods import common
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import load_clip_resolved
    from clip_gp_tpu.core.config import Config

    cfg = Config()
    cfg.model.backbone_name = BACKBONE
    arch, params, _ = load_clip_resolved(cfg, allow_random=True, seed=0)
    w = int(arch.transformer_width)
    k, t, n_ctx = CLASSES, T_TRIALS, N_CTX
    rng = np.random.default_rng(0)
    # CoOpSpec-shaped inputs: per-trial ctx [T, n_ctx, W]; shared prefix [K,1,W]
    # + suffix [K, 77-1-n_ctx, W]; frozen image features [T, B, D]
    ctx0 = jnp.asarray(0.02 * rng.normal(size=(t, n_ctx, w)).astype(np.float32))
    prefix = jnp.asarray(rng.normal(size=(k, 1, w)).astype(np.float32) * 0.02)
    suffix = jnp.asarray(
        rng.normal(size=(k, 77 - 1 - n_ctx, w)).astype(np.float32) * 0.02
    )
    eot = jnp.asarray(rng.integers(5, 70, size=(k,)).astype(np.int32))
    b_img = 32
    d_embed = int(arch.embed_dim)
    feats = common.l2_normalize(jnp.asarray(
        rng.normal(size=(t, b_img, d_embed)).astype(np.float32)
    ))
    labels = jnp.asarray(rng.integers(0, k, size=(t, b_img)).astype(np.int32))
    tower = {key: params[key] for key in
             ("pos_embed", "transformer", "ln_final", "text_projection")}

    def trial_loss(ctx, feats_t, labels_t, tower, prefix, suffix, eot):
        prompts = jnp.concatenate(
            [prefix, jnp.broadcast_to(ctx[None], (k,) + ctx.shape), suffix],
            axis=1,
        )
        text = clip_model.text_features_from_embeddings(
            tower, arch, prompts, eot
        )
        text = common.l2_normalize(text)
        logits = 100.0 * feats_t @ text.T
        return common.cross_entropy(logits, labels_t)

    def make_step():
        # fresh function object per mode: CLIP_GP_TPU_FUSED_VJP is read at
        # trace time inside the custom-VJP rules
        @jax.jit
        def step(ctx, feats, labels, tower, prefix, suffix, eot):
            def group_loss(ctx):
                losses = jax.vmap(
                    trial_loss, in_axes=(0, 0, 0, None, None, None, None)
                )(ctx, feats, labels, tower, prefix, suffix, eot)
                return losses.sum()

            loss, g = jax.value_and_grad(group_loss)(ctx)
            return ctx - 0.01 * g, loss

        return step

    # three differentiated-tower variants:
    #   noflash — plain XLA tower, standard AD (no custom_vjp wrappers): the
    #             pre-Pallas baseline a torch/XLA user would get;
    #   xla     — round-2 shipped path: Pallas-capable blocks whose custom
    #             VJP falls back to XLA math (its backward re-runs a full
    #             jax.vjp forward, so remat makes it a triple forward);
    #   pallas  — round-3 recompute-based Pallas backward kernels.
    # Measurement is interleaved round-robin with a per-mode MIN over reps:
    # the tunneled backend's throughput right after a wedge recovery is
    # erratic (observed 40 s/step on whichever mode happened to run first,
    # then 0.18 s steady-state), so a single sequential pass per mode
    # attributes tunnel state to the mode.
    modes = ("noflash", "xla", "pallas")
    steps = {}
    for mode in modes:
        if mode == "noflash":
            os.environ["CLIP_GP_TPU_DISABLE_FLASH"] = "1"
        else:
            os.environ.pop("CLIP_GP_TPU_DISABLE_FLASH", None)
            os.environ["CLIP_GP_TPU_FUSED_VJP"] = mode
        step = make_step()
        ctx, loss = step(ctx0, feats, labels, tower, prefix, suffix, eot)
        jax.block_until_ready(ctx)  # compile + first run
        steps[mode] = step
    os.environ.pop("CLIP_GP_TPU_DISABLE_FLASH", None)

    results = {m: float("inf") for m in modes}
    for rep in range(REPS):
        for mode in modes:
            step = steps[mode]
            ctx = ctx0
            ctx, loss = step(ctx, feats, labels, tower, prefix, suffix, eot)
            jax.block_until_ready(ctx)  # exclude any residual dispatch lag
            t0 = time.time()
            for _ in range(STEPS):
                ctx, loss = step(ctx, feats, labels, tower, prefix, suffix,
                                 eot)
            final = float(jnp.asarray(ctx).sum()) + float(loss)  # materialize
            dt = (time.time() - t0) / STEPS
            results[mode] = min(results[mode], dt)
            print(f"# rep={rep} mode={mode}: {dt * 1000:.1f} ms/step "
                  f"(final={final:.4f})", file=sys.stderr)

    print(json.dumps({
        "metric": "coop_group_train_step_ms",
        "backbone": BACKBONE,
        "trials": t, "classes": k, "n_ctx": n_ctx, "batch": b_img,
        "prompts_per_step": t * k,
        "noflash_ms": round(results["noflash"] * 1000, 1),
        "xla_vjp_ms": round(results["xla"] * 1000, 1),
        "pallas_vjp_ms": round(results["pallas"] * 1000, 1),
        "speedup_vs_noflash": round(results["noflash"] / results["pallas"], 3),
        "speedup_vs_xla_vjp": round(results["xla"] / results["pallas"], 3),
        "protocol": f"min over {REPS} interleaved reps of {STEPS} chained "
                    "steps per mode (tunnel-state-robust)",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
