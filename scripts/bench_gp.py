#!/usr/bin/env python3
"""GP-fit microbenchmark — the second BASELINE.md north-star metric
("GP fit + Cholesky ms/dataset").

Measures, at flagship sizes (K=100 classes, M=8 templates, D=1024 RN50
features, PCA d=256, S=30 MC samples, N=1600 cached few-shot features):
  - one jitted Adapter+GP train step (sample -> sparsemax -> MC-CE + KL + L2
    -> adamw update), ms/step;
  - a full 100-epoch GP fit, seconds;
  - one S=300 MC evaluation over a 2465-image test set, ms.

Prints one JSON object (not the driver contract — bench.py is the headline).
"""

from __future__ import annotations

import json
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from clip_gp_tpu.runtime import compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np
import optax

from clip_gp_tpu.gp import svgp
from clip_gp_tpu.methods import common

K, M, D = 100, 8, 1024
N_TRAIN, N_TEST = 1600, 2465
S_TRAIN, S_EVAL = 30, 300
EPOCHS = 100


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    cfg = types.SimpleNamespace(
        adapter=types.SimpleNamespace(
            gp_pca_dim=256, gp_kernel_type="rbf", gp_prior_temp=1.0,
            gp_jitter=1e-4,
        )
    )
    rng = np.random.default_rng(0)
    e = rng.normal(size=(K, M, D)).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    static, params, buffers = svgp.create_gp(jnp.asarray(e), cfg)
    full = {"visual_proj": jnp.eye(D), "gp": params}
    feats = jnp.asarray(rng.normal(size=(N_TRAIN, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, K, size=N_TRAIN).astype(np.int32))
    test_feats = jnp.asarray(rng.normal(size=(N_TEST, D)).astype(np.float32))

    tx = optax.adamw(1e-3)
    opt_state = tx.init(full)

    # feats/labels/buffers are explicit jit arguments, never closure leaves —
    # closed-over arrays become HLO constants (~17 MB here), the exact
    # failure mode CLAUDE.md's hard rule exists to prevent on tunneled
    # remote-compile backends
    def step(full, opt_state, feats, labels, buffers, key):
        def loss_fn(p):
            projected = feats @ p["visual_proj"].T
            f_norm = common.l2_normalize(projected)
            protos, _ = svgp.sample_prototypes(
                static, p["gp"], buffers, key, S_TRAIN
            )
            ce = common.mc_cross_entropy(f_norm, protos, labels, 100.0)
            kl = svgp.kl_divergence(p["gp"]).sum()
            l2 = ((p["visual_proj"] - jnp.eye(D)) ** 2).sum()
            return ce + 0.01 * kl + 0.125 * l2

        loss, grads = jax.value_and_grad(loss_fn)(full)
        updates, opt_state = tx.update(grads, opt_state, full)
        return optax.apply_updates(full, updates), opt_state, loss

    step_raw = jax.jit(step, donate_argnums=(0, 1))

    def step_jit(full, opt_state, key):
        return step_raw(full, opt_state, feats, labels, buffers, key)

    def evaluate(full, test_feats, buffers, key):
        protos, _ = svgp.sample_prototypes(static, full["gp"], buffers, key, S_EVAL)
        projected = test_feats @ full["visual_proj"].T
        return common.cosine_logits(projected, protos, 100.0)

    eval_raw = jax.jit(evaluate)

    def eval_jit(full, key):
        return eval_raw(full, test_feats, buffers, key)

    # NOTE on timing: the steps already form a dependency chain (each step
    # consumes the previous params/opt_state), so materializing the final
    # loss to host forces genuine execution of every step — necessary on
    # tunneled backends where block_until_ready returns early.
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    full, opt_state, loss = step_jit(full, opt_state, k1)  # warmup/compile
    float(loss)
    float(jnp.sum(eval_jit(full, k1)))

    t0 = time.perf_counter()
    for _ in range(20):
        key, k1 = jax.random.split(key)
        full, opt_state, loss = step_jit(full, opt_state, k1)
    float(loss)
    step_ms = (time.perf_counter() - t0) / 20 * 1000

    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        key, k1 = jax.random.split(key)
        full, opt_state, loss = step_jit(full, opt_state, k1)
    float(loss)
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = eval_jit(full, k1)
    float(jnp.sum(out))
    eval_ms = (time.perf_counter() - t0) * 1000

    print(
        json.dumps(
            {
                "gp_train_step_ms": round(step_ms, 2),
                "gp_fit_100_epochs_s": round(fit_s, 2),
                "gp_mc_eval_s300_ms": round(eval_ms, 1),
                "shape": f"K={K} M={M} D={D} d=256 S={S_TRAIN}/{S_EVAL} N={N_TRAIN}",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
