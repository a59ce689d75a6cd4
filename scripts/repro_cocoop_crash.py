#!/usr/bin/env python3
"""Minimal repro for the TPU-worker crash on the vmapped CoCoOp K=100 cell
(bench_sweep_methods, 2026-08-20: 3 crashes across 2 runs, always that cell).

Drives ONE vmapped CoCoOp train step at the exact failing shapes — T=5
trials x B=32 images x K=100 classes, ViT-B/16 text tower, PROMPT_BUDGET
chunking — on random arrays (no dataset, no trainer). Knobs:

  REPRO_T (5), REPRO_B (32), REPRO_K (100), REPRO_STEPS (3),
  REPRO_EVAL=1 also run the forward-only eval shape ([600] images),
  CLIP_GP_TPU_PROMPT_BUDGET (via methods.cocoop.PROMPT_BUDGET)

Prints one OK line per phase; a crash reproduces as JaxRuntimeError
UNAVAILABLE with the worker gone.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from clip_gp_tpu.methods import cocoop as cocoop_mod
    from clip_gp_tpu.methods.cocoop import conditional_logits
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params
    from clip_gp_tpu.methods import common

    T = int(os.environ.get("REPRO_T", "5"))
    B = int(os.environ.get("REPRO_B", "32"))
    K = int(os.environ.get("REPRO_K", "100"))
    steps = int(os.environ.get("REPRO_STEPS", "3"))
    if os.environ.get("CLIP_GP_TPU_PROMPT_BUDGET"):
        cocoop_mod.PROMPT_BUDGET = int(os.environ["CLIP_GP_TPU_PROMPT_BUDGET"])
    arch = clip_model.ARCHITECTURES["ViT-B/16"]
    d, ctx_dim, n_ctx = arch.embed_dim, arch.transformer_width, 4
    print(f"# T={T} B={B} K={K} budget={cocoop_mod.PROMPT_BUDGET} "
          f"chunk={max(1, min(B, int(cocoop_mod.PROMPT_BUDGET) // K))}",
          file=sys.stderr)

    root = jax.random.key(0)
    kc, kp, kf = jax.random.split(root, 3)
    text_params = {
        k: v for k, v in init_clip_params(kc, arch).items()
        if not k.startswith("visual")
    }
    tok_len = 77
    prefix = 0.01 * jax.random.normal(kp, (K, 1, ctx_dim))
    suffix = 0.01 * jax.random.normal(kp, (K, tok_len - 1 - n_ctx, ctx_dim))
    eot = jnp.full((K,), 20, dtype=jnp.int32)
    hidden = max(1, d // 16)

    def one_trial_params(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "ctx": 0.02 * jax.random.normal(k1, (n_ctx, ctx_dim)),
            "meta_fc1": {"w": 0.02 * jax.random.normal(k2, (d, hidden)),
                         "b": 0.02 * jax.random.normal(k3, (hidden,))},
            "meta_fc2": {"w": 0.02 * jax.random.normal(k4, (hidden, ctx_dim)),
                         "b": 0.02 * jax.random.normal(k5, (ctx_dim,))},
        }

    params_t = jax.vmap(one_trial_params)(jax.random.split(kp, T))
    feats = common.l2_normalize(jax.random.normal(kf, (T, B, d)))
    labels = jnp.tile(jnp.arange(B) % K, (T, 1))
    tx = optax.sgd(2e-3)
    opt_state = tx.init(params_t)
    scale = jnp.float32(100.0)

    def loss_one(p, f, l):
        logits = conditional_logits(
            text_params, arch, p, f, prefix, suffix, eot, K, scale
        )
        return common.cross_entropy(logits, l)

    @jax.jit
    def step(params_t, opt_state, feats, labels):
        def total(ps):
            return jax.vmap(loss_one)(ps, feats, labels).sum()

        loss, grads = jax.value_and_grad(total)(params_t)
        updates, opt_state = tx.update(grads, opt_state, params_t)
        return optax.apply_updates(params_t, updates), opt_state, loss

    t0 = time.time()
    if os.environ.get("REPRO_SCAN") == "1":
        # the runner's epoch_scan shape: ALL steps inside ONE dispatched
        # executable (watchdog/long-execution hypothesis)
        @jax.jit
        def scan_steps(params_t, opt_state, feats_s, labels_s):
            def body(carry, batch):
                p, o = carry
                f, l = batch
                p, o, loss = step_inner(p, o, f, l)
                return (p, o), loss

            (params_t, opt_state), losses = jax.lax.scan(
                body, (params_t, opt_state), (feats_s, labels_s)
            )
            return params_t, opt_state, losses

        def step_inner(params_t, opt_state, f, l):
            def total(ps):
                return jax.vmap(loss_one)(ps, f, l).sum()

            loss, grads = jax.value_and_grad(total)(params_t)
            updates, opt_state = tx.update(grads, opt_state, params_t)
            return optax.apply_updates(params_t, updates), opt_state, loss

        feats_s = jnp.broadcast_to(feats[None], (steps,) + feats.shape)
        labels_s = jnp.broadcast_to(labels[None], (steps,) + labels.shape)
        params_t, opt_state, losses = scan_steps(
            params_t, opt_state, feats_s, labels_s
        )
        loss = losses[-1]
        print(f"TRAIN OK (one scan dispatch): {steps} steps, "
              f"loss={float(loss):.4f}, {time.time() - t0:.1f}s",
              file=sys.stderr)
    else:
        for i in range(steps):
            params_t, opt_state, loss = step(
                params_t, opt_state, feats, labels
            )
        print(f"TRAIN OK: {steps} steps, loss={float(loss):.4f}, "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

    if os.environ.get("REPRO_EVAL") == "1":
        n_test = int(os.environ.get("REPRO_NTEST", "600"))
        feats_test = common.l2_normalize(
            jax.random.normal(kf, (n_test, d))
        )

        @jax.jit
        def evaluate(params_t, feats_test):
            return jax.vmap(
                lambda p: conditional_logits(
                    text_params, arch, p, feats_test, prefix, suffix, eot,
                    K, scale,
                )
            )(params_t)

        t0 = time.time()
        logits = evaluate(params_t, feats_test)
        np.asarray(logits)
        print(f"EVAL OK: [{T},{n_test},{K}] logits, "
              f"{time.time() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
