#!/usr/bin/env python3
"""Calibrate the per-backend single-dispatch prompt budgets.

Times DIFFERENTIATED prompt encodes (value_and_grad through the ViT-B/16
text tower at the CoCoOp worst-case chunking, bf16 like the training path)
with the dependency-chain protocol, derives cost-per-prompt, and persists
it next to the compile cache (runtime/dispatch_budget.py). After this runs
once on a backend, the CoCoOp dispatch/step budgets and the
SINGLE_STEP_CEILING warning threshold scale to THAT backend's speed
instead of the hard-coded tunneled-v5e constants (round-4 verdict #6:
faster hosts were leaving throughput on the table, slower ones would crash
workers again).

Bounded: a few chained steps over ~2k prompts ≈ well under a minute on any
backend in the v5e class; explicit env budgets always override the result
(CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS / _STEP_PROMPTS).

Usage: python scripts/calibrate_dispatch.py [--prompts 2048] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PROMPT_LEN = 77


def measure_cost_per_prompt(n_prompts: int, steps: int = 6) -> float:
    import jax
    import jax.numpy as jnp

    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params
    from clip_gp_tpu.ops.flash_attention import flash_for_grad
    from clip_gp_tpu.runtime import compile_cache

    compile_cache.enable()
    arch = clip_model.ARCHITECTURES["ViT-B/16"]
    params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )
    width = arch.transformer_width
    eot = jnp.full((n_prompts,), PROMPT_LEN - 1, dtype=jnp.int32)

    # the CoCoOp hot op: grads of a scalar of the text features w.r.t. the
    # injected embeddings — same tower, same remat-free worst case
    def loss(embeds, params):
        feats = clip_model.text_features_from_embeddings(
            params, arch, embeds, eot, compute_dtype=jnp.bfloat16,
            flash=flash_for_grad(),
        )
        return jnp.sum(feats * feats)

    @jax.jit
    def step(embeds, params):
        val, g = jax.value_and_grad(loss)(embeds, params)
        # derive the next input from this output (dependency chain: the
        # tunneled backend acks before executing and caches identical calls)
        return embeds + 1e-6 * g, val

    embeds = jax.random.normal(
        jax.random.key(1), (n_prompts, PROMPT_LEN, width), jnp.float32
    )
    embeds, val = step(embeds, params)  # compile + warm
    float(val)
    start = time.perf_counter()
    for _ in range(steps):
        embeds, val = step(embeds, params)
    float(val)  # materializes the whole chain
    elapsed = time.perf_counter() - start
    return elapsed / (steps * n_prompts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument(
        "--dry-run", action="store_true",
        help="measure and print, but do not persist",
    )
    args = ap.parse_args()

    from clip_gp_tpu.runtime import dispatch_budget
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    if not wait_for_backend():
        print("[calibrate] backend wedged; not calibrating", file=sys.stderr)
        sys.exit(1)
    cost = measure_cost_per_prompt(args.prompts, args.steps)
    key = dispatch_budget.device_key()
    out = {
        "device_key": key,
        "cost_per_prompt_s": cost,
        "dispatch_prompts": dispatch_budget._budget_from_cost(
            dispatch_budget.DISPATCH_SECONDS, cost,
            dispatch_budget.DEFAULT_DISPATCH_PROMPTS,
        ),
        "single_step_ceiling": dispatch_budget._budget_from_cost(
            dispatch_budget.HARD_CEILING_SECONDS, cost,
            dispatch_budget.DEFAULT_STEP_CEILING,
        ),
        "vs_v5e_reference": round(
            dispatch_budget.V5E_COST_PER_PROMPT_S / cost, 2
        ),
    }
    if not args.dry_run:
        path = dispatch_budget.save_calibration(
            cost,
            note=f"scripts/calibrate_dispatch.py --prompts {args.prompts}",
            key=key,
        )
        out["persisted_to"] = str(path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
