#!/usr/bin/env python3
"""ImageNet-scale CoCoOp on the vmap backend: the gradient-accumulation
validation run.

BASELINE config #4 runs CoCoOp over the full 11-dataset suite, which
includes ImageNet (K=1000). At T=5 trials x B=32 x K=1000, ONE vmapped
train step moves 160k differentiated prompt encodes ~= 69 s of device time
— above the tunneled TPU worker's ~60 s single-execution ceiling (bisected
2026-08-20, scripts/repro_cocoop_crash.py), and dispatch segmentation
floors at one step. `MethodSpec.microbatch_images` closes this: the runner
accumulates exact weighted micro-slice gradients (~18 images / ~35 s per
dispatch at the default 90k budget) and applies one update per step.

This script drives the PRODUCTION path (`run_vmapped_trials`) at that
shape — Synthetic K=1000, 1-shot, 1 epoch, 5 seeds, ViT-B/16 — and writes
BENCH_cocoop_imagenet_scale.json. Before microbatch_images this cell could
not run on the vmap backend at all (the in-process fallback was the
documented workaround); completion without a worker crash is the result,
the group time is the bonus.

Expected duration: ~1000 train images x T=5 x K=1000 differentiated
encodes at the measured ~0.43 ms each ~= 36 min of device time, plus the
forward-only final eval. Run alone (1-core bench host).

Knobs: BENCH_INKSCALE_CLASSES (1000), BENCH_INKSCALE_SEEDS (5),
BENCH_INKSCALE_SHOTS (1), BENCH_INKSCALE_EPOCHS (1).

ref workload: trainers/adapter_cocoop.py under utils/hparam_search.py's
imagenet rows (scripts/run_experiment.sh suite list).
"""

from __future__ import annotations

import atexit
import copy
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

SEEDS = list(range(1, 1 + int(os.environ.get("BENCH_INKSCALE_SEEDS", "5"))))
CLASSES = int(os.environ.get("BENCH_INKSCALE_CLASSES", "1000"))
SHOTS = int(os.environ.get("BENCH_INKSCALE_SHOTS", "1"))
EPOCHS = int(os.environ.get("BENCH_INKSCALE_EPOCHS", "1"))


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    import jax

    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="bench_inkscale_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    gen_t0 = time.time()
    # 4 images/class: ~2 train (covers the 1-shot draw), ~1 val, ~1 test —
    # keeps the forward-only final eval (n_test x T x K conditional
    # prompts) from dwarfing the train phase under test
    generate_synthetic_imagefolder(
        tmp, num_classes=CLASSES, images_per_class=4, image_size=224,
        seed=0, fmt="jpg",
    )
    gen_s = time.time() - gen_t0

    config = Config()
    config.dataset.name = "Synthetic"
    config.dataset.root = tmp
    config.dataset.num_shots = SHOTS
    config.model.backbone_name = "ViT-B/16"
    config.input.size = (224, 224)
    config.trainer_name = "Adapter-CoCoOp"
    config.dataloader.batch_size_train = 32
    config.dataloader.batch_size_test = 128
    config.dataloader.num_workers = 8
    config.adapter.n_ctx = 4
    config.adapter.clip_adapter_epochs = EPOCHS
    config.optim.name = "sgd"
    config.optim.lr = 0.002
    config.optim.max_epoch = EPOCHS
    config.train.print_freq = 10**9
    config.seed = SEEDS[0]

    for s in SEEDS:  # pre-generate few-shot pickles (not timed)
        cfg = copy.deepcopy(config)
        cfg.seed = s
        set_random_seed(s)
        build_data_manager(cfg)

    t0 = time.time()
    results = run_vmapped_trials(config, SEEDS, method="Adapter-CoCoOp")
    group_s = time.time() - t0
    assert len(results) == len(SEEDS)
    assert all(
        r["metrics"]["top1_acc"] == r["metrics"]["top1_acc"] for r in results
    ), "NaN top1"

    from clip_gp_tpu.methods.coop import trimmed_prompt_len
    from clip_gp_tpu.models.tokenizer import tokenize
    from clip_gp_tpu.parallel.k_bucket import bucket_k
    from clip_gp_tpu.parallel.trial_vmap import cocoop_microbatch_images

    t = len(SEEDS)
    b = config.dataloader.batch_size_train
    # the runner's FULL sizing rule, inputs derived exactly as the spec
    # derives them (k_pad bucketing + trimmed prompt length from the same
    # prompt strings) so this artifact cannot drift from the measured run
    dm = build_data_manager(copy.deepcopy(config))
    n_ctx = int(config.adapter.n_ctx)
    prompt_prefix = " ".join(["X"] * n_ctx)
    tokenized = tokenize(
        [f"{prompt_prefix} {n}." for n in dm.dataset.classnames]
    )
    prompt_len = trimmed_prompt_len(tokenized, n_ctx, 77 - 1 - n_ctx)
    k_pad = bucket_k(CLASSES)
    step_prompts = t * b * k_pad
    mb = cocoop_microbatch_images(t, b, k_pad, prompt_len)
    out = {
        "metric": "cocoop_imagenet_scale_vmap_group_s",
        "value": round(group_s, 1),
        "unit": "s",
        "seeds": t,
        "classes": CLASSES,
        "k_pad": k_pad,
        "prompt_len": prompt_len,
        "shots": SHOTS,
        "epochs": EPOCHS,
        "batch_size": b,
        "step_prompt_encodes": step_prompts,
        "microbatch_images": mb,
        "grad_dispatches_per_step": -(-b // mb),
        "dataset_gen_s": round(gen_s, 1),
        "backend": jax.default_backend(),
        "note": "production run_vmapped_trials at the BASELINE #4 "
                "ImageNet shape. Pre-trim, one unsplit step (~69 s device) "
                "exceeded the worker's single-execution ceiling and needed "
                "gradient accumulation; with the round-5 prompt trim "
                "(L'=16) the same step fits ONE dispatch under the "
                "length-scaled budget — completion without a worker crash "
                "is the result being measured",
    }
    print(json.dumps(out))
    (REPO / "BENCH_cocoop_imagenet_scale.json").write_text(
        json.dumps(out) + "\n"
    )


if __name__ == "__main__":
    main()
