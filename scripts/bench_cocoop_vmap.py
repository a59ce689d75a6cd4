#!/usr/bin/env python3
"""CoCoOp trial-group benchmark: vmapped backend vs in-process, real shapes.

Round 2 excluded CoCoOp from the vmap backend by assertion ("per-image
prompts make the trainable compute image-batch-shaped"); round 3 built the
T-seed variant (trial_vmap.CoCoOpSpec — ctx + meta-net on the trial axis,
conditional prompt encodes batched [T·C·K] per chunked tower call) and this
bench provides the measurement the closure lacked. BASELINE config #4 runs
CoCoOp over the full 11-dataset suite, so the sweep unit measured here is a
5-seed (dataset, shots) cell.

Protocol mirrors scripts/bench_coop_vmap.py: vmapped group timed cold+warm,
in-process group modeled as cold + (T-1)*warm sequential trials (both on a
fresh persistent compile cache). Throughput is weight-independent, so random
weights measure the same program a real checkpoint would run (ref workload:
trainers/adapter_cocoop.py + utils/hparam_search.py trial loop).

Run alone — the bench host has one CPU core and a concurrent pytest run
inflates the host phases 2-4x (see ROADMAP).
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

os.environ["CLIP_GP_TPU_COMPILE_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="bench_cocoop_xla_"
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
EPOCHS = int(os.environ.get("BENCH_COCOOP_EPOCHS", "3"))
CLASSES = int(os.environ.get("BENCH_COCOOP_CLASSES", "50"))
SHOTS = int(os.environ.get("BENCH_COCOOP_SHOTS", "16"))


def _config(root: str):
    from clip_gp_tpu.core.config import Config

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = root
    c.dataset.num_shots = SHOTS
    c.model.backbone_name = "ViT-B/16"
    c.input.size = (224, 224)
    c.trainer_name = "Adapter-CoCoOp"
    c.dataloader.batch_size_train = 32
    c.dataloader.batch_size_test = 128
    c.dataloader.num_workers = 8
    c.adapter.n_ctx = 4  # CoCoOp's configs use short contexts (ctx_init len)
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

    tmp = tempfile.mkdtemp(prefix="bench_cocoop_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    generate_synthetic_imagefolder(
        tmp, num_classes=CLASSES, images_per_class=max(SHOTS + 4, 20),
        image_size=224, seed=0, fmt="jpg",
    )
    config = _config(tmp)

    for s in SEEDS:
        cfg = copy.deepcopy(config)
        cfg.seed = s
        set_random_seed(s)
        build_data_manager(cfg)

    # Warm passes of the two modes are INTERLEAVED (vmap, inproc, vmap,
    # inproc; min per mode) so the tunneled backend's minute-to-minute RTT
    # drift hits both equally — mode-ordered passes measured a 25x phantom
    # delta once (see bench_fused_vjp.py / ROADMAP).
    def run_vmap():
        feature_cache.memo_clear()
        t0 = time.time()
        results = run_vmapped_trials(config, SEEDS, method="Adapter-CoCoOp")
        assert len(results) == len(SEEDS)
        return time.time() - t0

    def run_inproc(seed):
        feature_cache.memo_clear()
        cfg = copy.deepcopy(config)
        cfg.seed = seed
        cfg.output_dir = tempfile.mkdtemp(prefix="bench_cocoop_run_")
        atexit.register(shutil.rmtree, cfg.output_dir, ignore_errors=True)
        set_random_seed(cfg.seed)
        dm = build_data_manager(cfg)
        t0 = time.time()
        trainer = build_trainer(cfg, dm)
        trainer.train()
        return time.time() - t0

    vmap_s = run_vmap()  # cold (pays the vmapped-program compiles)
    cold_s = run_inproc(SEEDS[0])  # cold in-process trial
    vmap_w1 = run_vmap()
    inproc_w1 = run_inproc(SEEDS[1])
    vmap_w2 = run_vmap()
    inproc_w2 = run_inproc(SEEDS[1])
    vmap_warm_s = min(vmap_w1, vmap_w2)
    warm_s = min(inproc_w1, inproc_w2)
    group_inproc_s = cold_s + warm_s * (len(SEEDS) - 1)
    payload = {
        "metric": "cocoop_seed_group_time_s",
        "seeds": len(SEEDS),
        "classes": CLASSES,
        "shots": SHOTS,
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
    }
    print(json.dumps(payload))
    # persist per-shape cells so repeated runs at different K accumulate
    # into one artifact (the routing question is K-dependent)
    artifact = Path(__file__).resolve().parents[1] / "BENCH_cocoop_vmap.json"
    cells = {}
    if artifact.exists():
        cells = json.loads(artifact.read_text()).get("cells", {})
    cells[f"k{CLASSES}_shots{SHOTS}_e{EPOCHS}"] = payload
    artifact.write_text(json.dumps(
        {"metric": "cocoop_seed_group_time_s", "cells": cells}
    ) + "\n")


if __name__ == "__main__":
    main()
