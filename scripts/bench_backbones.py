#!/usr/bin/env python3
"""Per-backbone feature-extraction throughput across batch sizes.

Measures every real CLIP backbone (RN50/RN101/RN50x4/RN50x16/ViT-B/32/
ViT-B/16) at several batch sizes with the dependency-chain protocol
(bench.py docstring), printing one JSON object with an imgs/s table.

Usage: python scripts/bench_backbones.py [--backbones A,B] [--batches 128,256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from clip_gp_tpu.runtime import benchchain, compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np

DEFAULT_BACKBONES = ("ViT-B/16", "ViT-B/32", "RN50", "RN101", "RN50x4",
                     "RN50x16")
DEFAULT_BATCHES = (128, 256, 512)
TIMED_ITERS = 10


def measure(backbone: str, batch: int) -> float:
    from clip_gp_tpu.data.transforms import device_preprocess
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES[backbone]
    params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )

    @jax.jit
    def step(params, x):
        images = device_preprocess(x)
        out = clip_model.encode_image(
            params, arch, images, compute_dtype=jnp.bfloat16
        )
        return benchchain.advance_uint8(x, out), out

    rng = np.random.default_rng(0)
    res = int(arch.image_resolution)
    x = jnp.asarray(
        rng.integers(0, 256, size=(batch, res, res, 3), dtype=np.uint8)
    )
    x, out = step(params, x)  # warmup/compile
    float(jnp.sum(out))
    start = time.perf_counter()
    for _ in range(TIMED_ITERS):
        x, out = step(params, x)
    float(jnp.sum(out))
    elapsed = time.perf_counter() - start
    return batch * TIMED_ITERS / elapsed


def main(argv=None):
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbones", default=",".join(DEFAULT_BACKBONES))
    ap.add_argument("--batches", default=",".join(map(str, DEFAULT_BATCHES)))
    args = ap.parse_args(argv)
    backbones = [b.strip() for b in args.backbones.split(",") if b.strip()]
    batches = [int(b) for b in args.batches.split(",")]

    table = {}
    for backbone in backbones:
        row = {}
        for batch in batches:
            try:
                rate = measure(backbone, batch)
            except Exception as e:  # e.g. OOM at large batch x resolution
                row[str(batch)] = f"ERR:{type(e).__name__}"
                print(f"# {backbone} b={batch}: {e}", file=sys.stderr)
                continue
            row[str(batch)] = round(rate, 1)
            print(f"# {backbone:>9} b={batch:<4} {rate:,.0f} imgs/s",
                  file=sys.stderr)
        table[backbone] = row

    print(json.dumps({
        "metric": "feature_extract_imgs_per_sec_per_chip",
        "unit": "imgs/s",
        "backend": jax.default_backend(),
        "batches": batches,
        "table": table,
    }))


if __name__ == "__main__":
    main()
