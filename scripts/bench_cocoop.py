#!/usr/bin/env python3
"""CoCoOp step-time microbenchmark: blocked batched text encode vs the
chunked lax.map fallback.

The reference loops one image's K prompts at a time through the text tower
(ref: trainers/adapter_cocoop.py:70-82); round 1 chunked that into C·K-prompt
lax.map steps (budget 256 prompts); round 2 encodes the whole batch's B·K
prompts in ONE text-tower call when they fit PROMPT_BUDGET. This bench
measures a full CoCoOp train step (meta-net + ctx grads through the text
tower) at the flagship shape for both budgets.

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

if __name__ != "__external__":  # persistent compile cache (see train.py)
    import os as _os

    if _os.environ.get("CLIP_GP_TPU_NO_COMPILE_CACHE") != "1":
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/clip_gp_tpu/xla"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
import jax.numpy as jnp
import numpy as np
import optax

from clip_gp_tpu.methods import common
from clip_gp_tpu.methods.coop import build_prompt_parts
from clip_gp_tpu.models import clip_model
from clip_gp_tpu.models.clip_loader import init_clip_params

K = 100  # classes
B = 32  # batch
N_CTX = 4
STEPS = 10


def build_step(budget, clip_params, arch, parts, key):
    ctx_vectors, prefix, suffix, tokenized, n_ctx = parts
    eot = tokenized.argmax(axis=-1)
    vis_dim = int(arch.embed_dim)
    ctx_dim = int(arch.transformer_width)
    hidden = max(1, vis_dim // 16)
    k1, k2 = jax.random.split(key)
    params = {
        # copy: params are donated into the jit step; the shared ctx_vectors
        # buffer must survive for the second measure() call
        "ctx": jnp.array(ctx_vectors),
        "meta_fc1": {"w": 0.01 * jax.random.normal(k1, (vis_dim, hidden)),
                     "b": jnp.zeros(hidden)},
        "meta_fc2": {"w": 0.01 * jax.random.normal(k2, (hidden, ctx_dim)),
                     "b": jnp.zeros(ctx_dim)},
    }
    scale = 100.0
    chunk = max(1, min(B, budget // K))
    n_chunks = -(-B // chunk)

    def logits_fn(clip_params, params, img_feats, prefix, suffix, eot):
        h = jax.nn.relu(
            img_feats @ params["meta_fc1"]["w"] + params["meta_fc1"]["b"]
        )
        bias = h @ params["meta_fc2"]["w"] + params["meta_fc2"]["b"]
        ctx = params["ctx"]

        def per_chunk(args):
            feats_c, bias_c = args
            c = feats_c.shape[0]
            ctx_c = ctx[None, None] + bias_c[:, None, None]
            ctx_c = jnp.broadcast_to(ctx_c, (c, K) + ctx.shape)
            prompts = jnp.concatenate(
                [
                    jnp.broadcast_to(prefix[None], (c,) + prefix.shape),
                    ctx_c,
                    jnp.broadcast_to(suffix[None], (c,) + suffix.shape),
                ],
                axis=2,
            ).reshape(c * K, -1, ctx.shape[-1])
            text = clip_model.text_features_from_embeddings(
                clip_params, arch, prompts, jnp.tile(eot, c)
            ).reshape(c, K, -1)
            return scale * jnp.einsum(
                "cd,ckd->ck", feats_c, common.l2_normalize(text)
            )

        per_chunk = jax.checkpoint(per_chunk)
        if n_chunks == 1:
            return per_chunk((img_feats, bias))
        pad = n_chunks * chunk - B
        feats_p = jnp.pad(img_feats, ((0, pad), (0, 0)))
        bias_p = jnp.pad(bias, ((0, pad), (0, 0)))
        return jax.lax.map(
            per_chunk,
            (
                feats_p.reshape(n_chunks, chunk, -1),
                bias_p.reshape(n_chunks, chunk, -1),
            ),
        ).reshape(n_chunks * chunk, K)[:B]

    tx = optax.adamw(2e-3)
    opt_state = tx.init(params)

    def step(clip_params, params, opt_state, img_feats, labels,
             prefix_a, suffix_a, eot_a):
        def loss_fn(params):
            return common.cross_entropy(
                logits_fn(clip_params, params, img_feats,
                          prefix_a, suffix_a, eot_a),
                labels,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jit_step = jax.jit(step, donate_argnums=(1, 2))

    def bound_step(clip_params, params, opt_state, img_feats, labels):
        # prefix/suffix/eot as explicit args — closure leaves become HLO
        # constants (~15 MB MLIR at K=100) and crash remote compile
        return jit_step(clip_params, params, opt_state, img_feats, labels,
                        prefix, suffix, eot)

    return bound_step, params, opt_state


def measure(budget, clip_params, arch, parts, feats, labels):
    step, params, opt_state = build_step(
        budget, clip_params, arch, parts, jax.random.key(1)
    )
    params, opt_state, loss = step(clip_params, params, opt_state, feats, labels)
    float(loss)  # compile + warmup, forced to completion
    # dependency chain: each step consumes the previous params/opt_state;
    # materializing the final loss forces genuine execution of all steps
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss = step(
            clip_params, params, opt_state, feats, labels
        )
    float(loss)
    return (time.perf_counter() - t0) / STEPS * 1000


def main():
    arch = clip_model.ARCHITECTURES["ViT-B/16"]
    clip_params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )
    cfg = types.SimpleNamespace(
        adapter=types.SimpleNamespace(n_ctx=N_CTX, ctx_init="", csc=False)
    )
    classnames = [f"thing {i}" for i in range(K)]
    parts = build_prompt_parts(cfg, classnames, clip_params, jax.random.key(2))

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, int(arch.embed_dim))).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.asarray(feats)
    labels = jnp.asarray(rng.integers(0, K, size=B).astype(np.int32))

    from clip_gp_tpu.methods.cocoop import PROMPT_BUDGET

    ms_default = measure(PROMPT_BUDGET, clip_params, arch, parts, feats, labels)
    ms_batched = measure(B * K, clip_params, arch, parts, feats, labels)
    print(
        json.dumps(
            {
                f"cocoop_step_ms_default_budget{PROMPT_BUDGET}": round(
                    ms_default, 1
                ),
                "cocoop_step_ms_fully_batched": round(ms_batched, 1),
                "default_vs_batched": round(ms_batched / ms_default, 2),
                "shape": f"K={K} B={B} n_ctx={N_CTX} ViT-B/16 text tower",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
