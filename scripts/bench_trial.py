#!/usr/bin/env python3
"""Realistic end-to-end trial benchmark: flagship Adapter+GP at real shapes.

Times one full trial (the unit the sweep runner schedules 30× per dataset)
with real tower sizes and the real image pipeline on generated data:
100 classes × 16 shots of 224px images, ViT-B/16 (random weights — throughput
is weight-independent), 100 training epochs, S=30/300 MC sampling, full eval.

Prints a JSON object with the per-phase wall-clock breakdown from the
profiling subsystem — the evidence behind sweep-time projections (host decode
vs device extract vs GP fit vs eval).
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


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.datasets.synthetic import generate_synthetic_imagefolder
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.runtime import profiling

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="bench_trial_")
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
    c.optim.name = "adamw"
    c.train.print_freq = 10_000
    c.output_dir = os.path.join(tmp, "out")
    c.seed = 1

    set_random_seed(c.seed)
    profiling.reset_phases()
    t0 = time.time()
    dm = build_data_manager(c)
    trainer = build_trainer(c, dm)
    trainer.train()
    total_s = time.time() - t0

    with open(os.path.join(c.output_dir, "metrics.json")) as f:
        payload = json.load(f)

    report = {
        "total_trial_s": round(total_s, 1),
        "dataset_gen_s": round(gen_s, 1),
        "phases": {
            k: round(v["total_s"], 2)
            for k, v in profiling.phase_report().items()
        },
        "n_train": len(dm.dataset.train_x),
        "n_test": len(dm.dataset.test),
        "num_classes": dm.num_classes,
        "final_acc": round(payload["metrics"]["accuracy"], 2),
        "backbone": c.model.backbone_name,
        "epochs": 100,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
