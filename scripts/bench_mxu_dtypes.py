"""Probe the chip's matmul rate per dtype: bf16 vs int8 (and f32 for scale).

Motivation: v5e-class TPUs advertise 2x MXU throughput for int8 vs bf16
(394 TOPS vs 197 TFLOPS peak). If XLA actually delivers a ~2x int8 rate via
``lax.dot_general(..., preferred_element_type=int32)``, an opt-in int8
inference mode for the CLIP encoders is worth building; if not, it isn't.
This probe answers that question in one number per dtype.

Measurement follows the repo's dependency-chain protocol (bench.py): each
iteration's input derives from the previous output, and only the final value
is materialized, so remote caching / early-return ``block_until_ready`` on the
tunneled backend cannot fake the timing. All arrays are generated on-device
(never ship a big random host array over the tunnel — see CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from clip_gp_tpu.runtime import compile_cache

compile_cache.enable()

N = 8192  # 2*N^3 = 1.1 TFLOP per matmul: big enough to swamp dispatch
ITERS = 20
WINDOWS = 3


def _bench(step, a, i):
    """Time ``step`` over a counter-carried dependency chain.

    Each call consumes the previous call's output AND an incrementing
    on-device counter, so no two timed calls can ever present the same
    ``(executable, args)`` pair — the remote execution cache cannot answer
    any of them. (The original chains here reached a fixed point within a
    few iterations: int8 collapsed to all-zeros via ``& 7`` on a constant
    Gram, bf16/f32 underflowed to zero by repeated squaring — found in
    review, 2026-08-18.)
    """
    a, i = step(a, i)
    jnp.sum(a == 0).block_until_ready()  # compile + settle
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a, i = step(a, i)
        float(jnp.sum(a == 0))  # materialize the whole chain
        best = min(best, time.perf_counter() - t0)
    return 2 * N * N * N * ITERS / best / 1e12  # TOPS


def bench_bf16():
    @jax.jit
    def step(a, i):
        c = lax.dot_general(
            a, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # renormalize so operand entries stay O(1) (repeated squaring would
        # underflow to zero); the counter term keeps every input fresh even
        # if the normalized iteration settled into a fixed point
        s = jnp.abs(c).mean() + 1e-30
        a_next = (c / s + (i % 7).astype(jnp.float32) * 1e-2)
        return a_next.astype(jnp.bfloat16), i + 1

    a0 = jax.random.normal(jax.random.key(0), (N, N), jnp.bfloat16)
    return _bench(step, a0, jnp.uint32(0))


def bench_int8():
    @jax.jit
    def step(a, i):
        c = lax.dot_general(
            a, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # fold the int32 accumulator down with a shift (not a tiny mask,
        # which zeroed a constant Gram); wrap-around cast spreads values
        # over the full int8 range and + i keeps every input fresh
        a_next = ((c >> 8) + i.astype(jnp.int32)).astype(jnp.int8)
        return a_next, i + 1

    a0 = jax.random.randint(
        jax.random.key(1), (N, N), -128, 128, jnp.int32
    ).astype(jnp.int8)
    return _bench(step, a0, jnp.uint32(0))


def bench_f32():
    @jax.jit
    def step(a, i):
        c = a @ a
        s = jnp.abs(c).mean() + 1e-30
        return c / s + (i % 7).astype(jnp.float32) * 1e-2, i + 1

    a0 = jax.random.normal(jax.random.key(2), (N, N), jnp.float32)
    return _bench(step, a0, jnp.uint32(0))


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    out = {
        "n": N,
        "bf16_tflops": round(bench_bf16(), 1),
        "int8_tops": round(bench_int8(), 1),
        "f32_tflops": round(bench_f32(), 1),
    }
    out["int8_vs_bf16"] = round(out["int8_tops"] / out["bf16_tflops"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
