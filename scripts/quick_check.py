#!/usr/bin/env python3
"""Smoke test: run every method for a few epochs on one dataset in throwaway
temp dirs and report OK/FAIL per method (ref: scripts/quick_check.py —
which covered 4 methods and referenced a missing config; this one covers all
six and works out of the box).

By default uses the synthetic dataset + tiny random-weight towers so it runs
anywhere; pass --dataset/--backbone/--root to smoke real data instead.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

METHODS = [
    ("baseline", "Adapter", {}),
    ("gp", "Adapter", {"use_gp": True, "gp_pca_dim": 8}),
    ("coop", "Adapter-CoOp", {"n_ctx": 2}),
    ("cocoop", "Adapter-CoCoOp", {"n_ctx": 2}),
    ("clip-adapter", "CLIP-Adapter", {}),
    ("taskres", "TaskRes", {}),
    ("tipa", "Tip-Adapter", {}),
    ("tipa-f", "Tip-Adapter-F", {}),
]


def run_one(label, trainer_name, overrides, args) -> bool:
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager

    with tempfile.TemporaryDirectory() as tmp:
        c = Config()
        c.trainer_name = trainer_name
        c.dataset.name = args.dataset
        c.dataset.root = args.root or os.path.join(tmp, "data")
        c.dataset.num_shots = 4
        c.model.backbone_name = args.backbone
        if args.backbone.startswith("TEST"):
            c.input.size = (32, 32)
        c.dataloader.batch_size_train = 8
        c.dataloader.batch_size_test = 16
        c.dataloader.num_workers = 2
        c.adapter.num_templates = 2
        c.adapter.clip_adapter_epochs = args.epochs
        c.adapter.taskres_epochs = args.epochs
        c.adapter.tip_adapter_epochs = args.epochs
        c.adapter.gp_num_mc_samples_train = 4
        c.adapter.gp_num_mc_samples_eval = 8
        c.optim.max_epoch = args.epochs
        c.train.print_freq = 1000
        c.output_dir = os.path.join(tmp, "out")
        c.seed = 1
        for k, v in overrides.items():
            setattr(c.adapter, k, v)
        try:
            set_random_seed(c.seed)
            dm = build_data_manager(c)
            trainer = build_trainer(c, dm)
            trainer.train()
            return os.path.exists(os.path.join(c.output_dir, "metrics.json"))
        except Exception:
            traceback.print_exc()
            return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="Synthetic")
    ap.add_argument("--backbone", default="TEST-ViT")
    ap.add_argument("--root", default=None)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    if args.backbone.startswith("TEST"):
        os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    results = {}
    for label, trainer_name, overrides in METHODS:
        print(f"\n===== quick check: {label} =====")
        results[label] = run_one(label, trainer_name, overrides, args)

    print("\n===== summary =====")
    ok = True
    for label, passed in results.items():
        print(f"{label:14s} {'OK' if passed else 'FAIL'}")
        ok &= passed
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
