#!/usr/bin/env python3
"""Sweep-cell benchmark: 5 seeds × 2 GP betas trained as ONE vmapped program
at realistic scale (100 classes × 16 shots of 224px images, ViT-B/16, 100 GP
epochs, S=30/300).

This is the unit the reference schedules as 10 separate GPU subprocesses;
here the frozen tower encodes the seed-union once and all 10 trials advance
together on one chip. Prints a JSON report with the wall-clock split.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")



from clip_gp_tpu.runtime import compile_cache

compile_cache.enable()


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.data.datasets.synthetic import generate_synthetic_imagefolder
    from clip_gp_tpu.parallel.trial_vmap import run_seed_vmapped_adapter

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="bench_sweep_")
    t0 = time.time()
    generate_synthetic_imagefolder(
        tmp, num_classes=100, images_per_class=36, image_size=224, seed=0
    )
    gen_s = time.time() - t0

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = tmp
    c.dataset.num_shots = 16
    c.model.backbone_name = "ViT-B/16"
    c.input.size = (224, 224)
    c.dataloader.batch_size_train = 128
    c.dataloader.batch_size_test = 128
    c.dataloader.num_workers = max(2, os.cpu_count() or 2)
    c.adapter.num_templates = 8
    c.adapter.use_gp = True
    c.adapter.gp_kernel_type = "linear"
    c.adapter.gp_num_mc_samples_train = 30
    c.adapter.gp_num_mc_samples_eval = 300
    c.adapter.clip_adapter_epochs = 100
    c.optim.max_epoch = 100
    c.train.print_freq = 10_000
    c.seed = 1

    seeds = [1, 2, 3, 4, 5] * 2
    overrides = [{"gp_beta": 0.001}] * 5 + [{"gp_beta": 0.1}] * 5
    outdirs = [os.path.join(tmp, f"out/t{i}") for i in range(10)]

    t0 = time.time()
    results = run_seed_vmapped_adapter(
        c, seeds, outdirs, trial_overrides=overrides
    )
    sweep_s = time.time() - t0

    print(
        json.dumps(
            {
                "sweep_cell_trials": len(results),
                "sweep_cell_s": round(sweep_s, 1),
                "s_per_trial": round(sweep_s / len(results), 1),
                "dataset_gen_s": round(gen_s, 1),
                "epochs": 100,
                "backbone": c.model.backbone_name,
                "accs": [round(r["metrics"]["top1_acc"], 1) for r in results],
            }
        )
    )


if __name__ == "__main__":
    main()
