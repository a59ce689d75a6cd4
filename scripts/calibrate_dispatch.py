#!/usr/bin/env python3
"""Calibrate the per-backend single-dispatch prompt budgets.

Times DIFFERENTIATED prompt encodes (value_and_grad through the ViT-B/16
text tower at the CoCoOp chunked shape, bf16 like the training path) with
the dependency-chain protocol and persists the reading next to the compile
cache. The reading is a SPEED INDEX, not an absolute step cost: budgets
scale by reference-v5e-reading / this-reading (runtime/dispatch_budget.py
V5E_PROBE_COST_S), so the probe's proxy-vs-deployed bias cancels and on
the reference backend the budgets stay exactly the measured-safe
constants. After this runs
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

    # the CoCoOp hot op at its DEPLOYED worst-case shape: the budgets bound
    # work for conditional_logits' chunked path (≈PROMPT_BUDGET prompts per
    # rematted tower call — methods/cocoop.py), which runs ~1.6× slower per
    # prompt than one fully-batched call; calibrating on the batched rate
    # would produce dispatch budgets that overshoot the ~60 s worker-kill
    # deadline when the real chunked workload runs
    from clip_gp_tpu.methods.cocoop import PROMPT_BUDGET

    chunk = max(1, int(PROMPT_BUDGET))
    n_chunks = max(1, n_prompts // chunk)

    def loss(embeds, params):
        def tower(args):
            e_s, eo_s = args
            return clip_model.text_features_from_embeddings(
                params, arch, e_s, eo_s, compute_dtype=jnp.bfloat16,
                flash=flash_for_grad(),
            )

        feats = jax.lax.map(
            jax.checkpoint(tower),
            (
                embeds[: n_chunks * chunk].reshape(
                    n_chunks, chunk, *embeds.shape[1:]
                ),
                eot[: n_chunks * chunk].reshape(n_chunks, chunk),
            ),
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
    return elapsed / (steps * n_chunks * chunk)


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
        "dispatch_prompts": dispatch_budget._scale_by_speed_index(
            dispatch_budget.DEFAULT_DISPATCH_PROMPTS, cost
        ),
        "single_step_ceiling": dispatch_budget._scale_by_speed_index(
            dispatch_budget.DEFAULT_STEP_CEILING, cost
        ),
        "speed_index_vs_v5e": round(
            dispatch_budget.V5E_PROBE_COST_S / cost, 2
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
