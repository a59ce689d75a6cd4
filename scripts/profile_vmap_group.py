#!/usr/bin/env python3
"""Profile one realistic vmapped trial group (the unit the sweep runner
schedules) and print the per-phase wall-clock breakdown — used to find where
group time goes when optimizing the north-star sweep (BENCH_sweep.json).

Usage: python scripts/profile_vmap_group.py [--shots 4] [--classes 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("CLIP_GP_TPU_NATIVE_DECODE", "1")



from clip_gp_tpu.runtime import compile_cache

compile_cache.enable()


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=4)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--images-per-class", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the group N times (first run pays compiles)")
    args = ap.parse_args()

    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )
    from clip_gp_tpu.parallel.trial_vmap import run_seed_vmapped_adapter
    from clip_gp_tpu.runtime.profiling import phase_report, reset_phases

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="profile_vmap_")
    generate_synthetic_imagefolder(
        tmp, num_classes=args.classes, images_per_class=args.images_per_class,
        image_size=224, seed=0, fmt="jpg",
    )

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = tmp
    c.dataset.num_shots = args.shots
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
    c.adapter.clip_adapter_epochs = args.epochs
    c.optim.max_epoch = args.epochs
    c.train.print_freq = 10_000
    c.seed = 1

    for r in range(args.repeat):
        reset_phases()
        t0 = time.time()
        run_seed_vmapped_adapter(c, [1, 2, 3, 4, 5], None)
        total = time.time() - t0
        rep = phase_report()
        rep["TOTAL"] = {"total_s": total, "count": 1}
        print(f"=== run {r + 1}/{args.repeat} ===", file=sys.stderr)
        print(json.dumps(
            {k: round(v["total_s"], 2) for k, v in rep.items()}, indent=2
        ))


if __name__ == "__main__":
    main()
