"""End-to-end ViT encode throughput: bf16 tower vs opt-in int8 tower.

The dtype probe (scripts/bench_mxu_dtypes.py) measured the chip at
~1.7x int8-vs-bf16 matmul rate (247.6 TOPS vs 147.4 TFLOPs at 8192^3); this
bench answers what that buys on the real encoder, where attention, LayerNorm,
GELU and the quantize/rescale overhead dilute the matmul win.

Protocol: dependency chain (see bench.py docstring) — each iteration's input
is derived from the previous output, only the final value is materialized.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from clip_gp_tpu.runtime import benchchain, compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np

BATCH = 256
TIMED_ITERS = 20
WINDOWS = 3


def measure(arch_name: str, use_int8: bool) -> float:
    from clip_gp_tpu.data.transforms import device_preprocess
    from clip_gp_tpu.models import clip_model, quantized
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES[arch_name]
    params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )
    if use_int8:
        tower = quantized.quantize_visual_jit(params, arch)

        @jax.jit
        def step(tower, x):
            out = quantized.encode_image_q8(tower, arch, device_preprocess(x))
            return benchchain.advance_uint8(x, out), out
    else:
        tower = params

        @jax.jit
        def step(tower, x):
            out = clip_model.encode_image(
                tower, arch, device_preprocess(x), compute_dtype=jnp.bfloat16
            )
            return benchchain.advance_uint8(x, out), out

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 256, size=(BATCH, 224, 224, 3), dtype=np.uint8)
    )
    x, out = step(tower, x)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(WINDOWS):
        start = time.perf_counter()
        for _ in range(TIMED_ITERS):
            x, out = step(tower, x)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - start)
    return BATCH * TIMED_ITERS / best


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    out = {"batch": BATCH}
    for name in ("ViT-B/16", "ViT-B/32"):
        key = name.replace("/", "").replace("-", "").lower()
        bf16 = round(measure(name, use_int8=False), 1)
        q8 = round(measure(name, use_int8=True), 1)
        out[f"{key}_bf16_imgs_per_sec"] = bf16
        out[f"{key}_int8_imgs_per_sec"] = q8
        out[f"{key}_speedup"] = round(q8 / bf16, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
