#!/usr/bin/env python3
"""CoOp trial-group benchmark: vmapped backend vs in-process, real shapes.

BASELINE config #4's sweep unit is a CoOp seed group (5 seeds per
dataset/shot cell). The vmapped backend trains the group as ONE program —
the text tower batches T·K prompts per step and the frozen image tower
encodes the UNION of the seeds' few-shot images once per epoch — while the
in-process path runs T sequential trials, each with its own per-epoch
encodes and K-prompt text passes.

Measures both at realistic scale (default: 50 classes × 16 shots of 224px
JPEGs, ViT-B/16 random weights, n_ctx=16, batch 32) and prints one JSON
line with wall-clocks and the group-level speedup. Throughput is
weight-independent, so random weights measure the same program the real
checkpoint would run (ref workload: trainers/adapter_coop.py +
utils/hparam_search.py trial loop).

Run alone — the bench host has one CPU core and a concurrent pytest run
inflates the host phases 2-4× (see ROADMAP).
"""

from __future__ import annotations

import copy
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

# Persistent compile cache pointed at a FRESH dir: every invocation then
# measures the same program — the vmapped group and the in-process seed-1
# trial compile cold, and the in-process seed-2 trial loads seed-1's entries
# (exactly what a real sequential group's later seeds do). Reusing the
# shared on-disk cache would silently turn "cold" into "warm" on any rerun.
os.environ["CLIP_GP_TPU_COMPILE_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="bench_coop_xla_"
)
import atexit  # noqa: E402
import shutil  # noqa: E402

atexit.register(
    shutil.rmtree, os.environ["CLIP_GP_TPU_COMPILE_CACHE_DIR"],
    ignore_errors=True,
)
from clip_gp_tpu.runtime import compile_cache  # noqa: E402

compile_cache.enable()

SEEDS = [1, 2, 3, 4, 5]
EPOCHS = int(os.environ.get("BENCH_COOP_EPOCHS", "6"))
CLASSES = int(os.environ.get("BENCH_COOP_CLASSES", "50"))


def _config(root: str):
    from clip_gp_tpu.core.config import Config

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = root
    c.dataset.num_shots = 16
    c.model.backbone_name = "ViT-B/16"
    c.input.size = (224, 224)
    c.trainer_name = "Adapter-CoOp"
    c.dataloader.batch_size_train = 32
    c.dataloader.batch_size_test = 128
    c.dataloader.num_workers = 8
    c.adapter.n_ctx = 16
    c.adapter.clip_adapter_epochs = EPOCHS
    c.optim.name = "sgd"
    c.optim.lr = 0.002
    c.optim.max_epoch = EPOCHS
    c.train.print_freq = 10**9
    return c


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.runtime import feature_cache

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="bench_coop_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    generate_synthetic_imagefolder(
        tmp, num_classes=CLASSES, images_per_class=36, image_size=224,
        seed=0, fmt="jpg",
    )
    config = _config(tmp)

    # pre-generate every seed's few-shot pickle cache so neither timed run
    # pays the one-time split sampling
    for s in SEEDS:
        cfg = copy.deepcopy(config)
        cfg.seed = s
        set_random_seed(s)
        build_data_manager(cfg)

    # ---- vmapped group: T seeds as one program --------------------------
    # Timed twice: the cold pass pays the one-off XLA compile of the group
    # executable; the warm pass is the steady state every later
    # (dataset, shots) cell of a real sweep runs at (the compiled
    # executables persist in-process and on disk). A sweep with G cells
    # costs cold + (G-1)*warm, so BOTH numbers matter — cold for tiny
    # sweeps, warm for the 55-cell BASELINE shape.
    feature_cache.memo_clear()
    t0 = time.time()
    results = run_vmapped_trials(config, SEEDS, method="Adapter-CoOp")
    vmap_s = time.time() - t0
    assert len(results) == len(SEEDS)

    feature_cache.memo_clear()
    t0 = time.time()
    results = run_vmapped_trials(config, SEEDS, method="Adapter-CoOp")
    vmap_warm_s = time.time() - t0
    assert len(results) == len(SEEDS)

    # ---- in-process: cold trial + (T-1) x warm trial ---------------------
    # A real sequential seed group pays one cold compile (seed 1) and then
    # warm-cache trials (the sweep backends enable the persistent compile
    # cache, and jit re-traces serve from it). Timing one cold trial and one
    # warm trial and modeling the group as cold + (T-1)*warm UNDERSTATES the
    # real group slightly (a fresh process re-loads the persistent cache;
    # our warm run reuses in-memory jit caches) — i.e. the reported speedup
    # is conservative.
    def run_inproc(seed):
        feature_cache.memo_clear()
        cfg = copy.deepcopy(config)
        cfg.seed = seed
        cfg.output_dir = tempfile.mkdtemp(prefix="bench_coop_run_")
        atexit.register(shutil.rmtree, cfg.output_dir, ignore_errors=True)
        set_random_seed(cfg.seed)
        dm = build_data_manager(cfg)
        t0 = time.time()
        trainer = build_trainer(cfg, dm)
        trainer.train()
        return time.time() - t0

    cold_s = run_inproc(SEEDS[0])
    warm_s = run_inproc(SEEDS[1])
    group_inproc_s = cold_s + warm_s * (len(SEEDS) - 1)
    print(json.dumps({
        "metric": "coop_seed_group_time_s",
        "seeds": len(SEEDS),
        "classes": CLASSES,
        "epochs": EPOCHS,
        "vmapped_group_s": round(vmap_s, 1),
        "vmapped_group_warm_s": round(vmap_warm_s, 1),
        "inprocess_trial_cold_s": round(cold_s, 1),
        "inprocess_trial_warm_s": round(warm_s, 1),
        "inprocess_group_s": round(group_inproc_s, 1),
        "speedup": round(group_inproc_s / vmap_s, 2),
        "speedup_warm": round(warm_s * len(SEEDS) / vmap_warm_s, 2),
        "baseline_note": "group modeled as cold + (T-1)*warm trials; "
                         "speedup_warm compares steady states (warm vmapped "
                         "group vs T warm sequential trials) — the regime "
                         "every later cell of a multi-cell sweep runs in",
    }))


if __name__ == "__main__":
    main()
