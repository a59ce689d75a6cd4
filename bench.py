"""Headline benchmark: CLIP ViT-B/16 feature extraction throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "imgs/s", "vs_baseline": N}

This is the dominant compute of every CLIP-GP run (the encoders are frozen and
features are extracted once per split — ref: trainers/adapter.py:886-926), so
imgs/sec/chip is the throughput north star (BASELINE.md). Weights are random
(weights don't affect throughput; no checkpoint egress in this environment);
images run in bf16 with fp32 LayerNorm/softmax.

``vs_baseline``: the reference publishes no numbers (BASELINE.md: "none"), so
the denominator is a documented estimate of the reference's torch fp32
ViT-B/16 single-V100 encode throughput (~325 imgs/s, typical public figure
for torch fp32 ViT-B/16 inference at batch 128 on V100 — the class of GPU the
reference targets with its per-GPU trial scheduler).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_TORCH_V100_IMGS_PER_SEC = 325.0

BATCH = 512
WARMUP_ITERS = 3
TIMED_ITERS = 24


def main():
    from clip_gp_tpu.data.transforms import device_preprocess
    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES["ViT-B/16"]
    # jit the init (one compiled program instead of thousands of eager
    # dispatches) and keep params an explicit argument of encode — closed-over
    # weights would be baked into the executable as constants
    params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )
    jax.block_until_ready(params)

    @jax.jit
    def encode(params, images_u8):
        images = device_preprocess(images_u8)
        return clip_model.encode_image(
            params, arch, images, compute_dtype=jnp.bfloat16
        )

    rng = np.random.default_rng(0)
    # distinct device-resident batches per iteration — identical (executable,
    # args) pairs can be served from a remote-execution cache on tunneled
    # backends, which would fake the timing
    n_bufs = 6
    image_bufs = [
        jnp.asarray(rng.integers(0, 256, size=(BATCH, 224, 224, 3), dtype=np.uint8))
        for _ in range(n_bufs)
    ]
    jax.block_until_ready(image_bufs)

    @jax.jit
    def bump(images_u8, step):
        return images_u8 ^ step.astype(jnp.uint8)

    for i in range(WARMUP_ITERS):
        encode(params, image_bufs[i % n_bufs]).block_until_ready()

    start = time.perf_counter()
    outs = []
    for i in range(TIMED_ITERS):
        imgs = bump(image_bufs[i % n_bufs], jnp.uint8(i + 1))
        outs.append(encode(params, imgs))
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start

    imgs_per_sec = BATCH * TIMED_ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "vitb16_feature_extract_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/s",
                "vs_baseline": round(
                    imgs_per_sec / REFERENCE_TORCH_V100_IMGS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
