#!/usr/bin/env python3
"""BASELINE #3/#4 sweep-shape benchmark on the vmap backend, one command.

Round 2 proved "all heads vmap" per-head; this artifact is the end-to-end
measured witness: it drives `trial_vmap.run_vmapped_trials` DIRECTLY —
bypassing the sweep router, so there is no in-process fallback path and
every successful cell is vmapped by construction — over synthetic-backed
datasets shaped like the BASELINE configs:

- **#3**: OxfordPets(37) / DTD(47) / EuroSAT(10)-class datasets ×
  {CLIP-Adapter, TaskRes, Tip-Adapter-F} × 5 seeds;
- **#4**: CoOp (and CoCoOp unless skipped) × representative class counts of
  the 11-dataset suite × 5 seeds, ViT-B/16.

Emits one JSON line (written to BENCH_sweep_methods.json) with per-cell group
times, trials/s, and the projected full-suite wall-clock. Envs:
BENCH_METHODS_SHOTS (default "16"), BENCH_METHODS_EPOCHS (default 10),
BENCH_METHODS_SKIP_COCOOP=1 to drop the most expensive family.

Run alone — the bench host has one CPU core (see ROADMAP).
"""

from __future__ import annotations

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

if os.environ.get("CLIP_GP_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import atexit  # noqa: E402
import shutil  # noqa: E402

from clip_gp_tpu.runtime import compile_cache  # noqa: E402

compile_cache.enable()

SEEDS = [int(s) for s in
         os.environ.get("BENCH_METHODS_SEEDS", "1,2,3,4,5").split(",")]
SHOTS = [int(s) for s in os.environ.get("BENCH_METHODS_SHOTS", "16").split(",")]
EPOCHS = int(os.environ.get("BENCH_METHODS_EPOCHS", "10"))
# prompt methods re-encode K (CoOp) or B·K (CoCoOp) prompts through the text
# tower EVERY step — a 10-epoch K=100 CoCoOp cell alone runs ~40 min, so the
# witness uses fewer epochs there (group time scales ~linearly in epochs;
# the payload records both epoch counts so projections stay honest)
PROMPT_EPOCHS = int(os.environ.get("BENCH_METHODS_PROMPT_EPOCHS", "2"))
# smoke-test knobs (CI/CPU): tiny tower + image size; the artifact numbers
# are only meaningful with the default ViT-B/16 at 224 on TPU
BACKBONE = os.environ.get("BENCH_METHODS_BACKBONE", "ViT-B/16")
IMG = 224 if BACKBONE.startswith("ViT-B") or BACKBONE.startswith("RN") else 32
# BASELINE #3 dataset shapes (classes as in the real catalogs)
DATASETS_3 = {"oxford_pets": 37, "dtd": 47, "eurosat": 10}
METHODS_3 = ["CLIP-Adapter", "TaskRes", "Tip-Adapter"]
# BASELINE #4: representative class counts of the 11-dataset CoOp suite
# (eurosat 10, dtd 47, and the FIVE ~100-class datasets — caltech101/
# fgvc_aircraft 100, food101/ucf101 101, oxford_flowers 102 — that share
# the 102 K-bucket, parallel/k_bucket.py); the 100/101/102 trio measures
# bucket amortization: the first cell compiles the bucket's programs, the
# other two must run warm. imagenet-scale K is covered by the throughput
# model, not re-run per bench
DATASETS_4 = {
    "eurosat": 10, "dtd": 47,
    "caltech101_like": 100, "food101_like": 101, "flowers_like": 102,
}
METHODS_4 = ["Adapter-CoOp"] + (
    [] if os.environ.get("BENCH_METHODS_SKIP_COCOOP") == "1"
    else ["Adapter-CoCoOp"]
)
if os.environ.get("BENCH_METHODS_SMOKE") == "1":
    # functional check on CPU/CI: one small dataset per family; projections
    # from a smoke run are meaningless and the payload is flagged as such
    DATASETS_3 = {"eurosat": 10}
    DATASETS_4 = {"eurosat": 10}
FULL_SUITE_SHOTS = 5    # {1,2,4,8,16}
FULL_SUITE_DATASETS_3 = 3
FULL_SUITE_DATASETS_4 = 11


def _config(root, method, shots, num_classes):
    from clip_gp_tpu.core.config import Config

    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = root
    c.dataset.num_shots = shots
    c.model.backbone_name = BACKBONE
    c.input.size = (IMG, IMG)
    c.trainer_name = method
    c.dataloader.batch_size_train = 32
    c.dataloader.batch_size_test = 128
    c.dataloader.num_workers = max(2, os.cpu_count() or 2)
    c.adapter.num_templates = 8
    epochs = PROMPT_EPOCHS if method in ("Adapter-CoOp", "Adapter-CoCoOp") \
        else EPOCHS
    c.adapter.clip_adapter_epochs = epochs
    c.adapter.taskres_epochs = epochs
    c.adapter.tip_adapter_epochs = epochs
    c.adapter.tip_adapter_trainable = True  # the -F variant
    c.adapter.n_ctx = 4
    c.optim.max_epoch = epochs
    c.train.print_freq = 10**9
    c.seed = 1
    return c


def main():
    from clip_gp_tpu.runtime.backend_guard import wait_for_backend

    wait_for_backend()
    import jax

    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.datasets.synthetic import (
        generate_synthetic_imagefolder,
    )
    from clip_gp_tpu.data.pipeline import build_data_manager
    from clip_gp_tpu.parallel.trial_vmap import run_vmapped_trials
    from clip_gp_tpu.parallel.sweep import _vmap_supported
    from clip_gp_tpu.runtime import feature_cache

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401
    import copy

    roots = {}
    gen_t0 = time.time()
    for name, k in {**DATASETS_3, **DATASETS_4}.items():
        root = tempfile.mkdtemp(prefix=f"bench_methods_{name}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        generate_synthetic_imagefolder(
            root, num_classes=k, images_per_class=max(max(SHOTS) + 4, 20),
            image_size=IMG, seed=0, fmt="jpg",
        )
        roots[name] = root
    gen_s = time.time() - gen_t0

    def run_cell(method, ds_name, k, shots):
        """One (method, dataset, shots) seed group on the vmap backend."""
        config = _config(roots[ds_name], method, shots, k)
        assert _vmap_supported(config, len(SEEDS)), (method, ds_name)
        for s in SEEDS:  # pre-generate few-shot pickles (not timed)
            cfg = copy.deepcopy(config)
            cfg.seed = s
            set_random_seed(s)
            build_data_manager(cfg)
        feature_cache.memo_clear()
        t0 = time.time()
        results = run_vmapped_trials(config, SEEDS, method=method)
        dt = time.time() - t0
        assert len(results) == len(SEEDS)
        assert all(
            r["metrics"]["top1_acc"] == r["metrics"]["top1_acc"]  # not NaN
            for r in results
        )
        return dt

    cells = {}
    failed = {}
    partial_path = REPO / "BENCH_sweep_methods.partial.json"

    def run_cell_guarded(method, ds_name, k, shots):
        """A TPU-worker crash mid-cell (observed 2026-08-20 on the CoCoOp
        K=100 cell) must not discard the 40 min of cells already measured:
        retry once after waiting for the backend; on a second failure record
        the cell as failed and keep going. Partial results persist after
        every cell."""
        key = f"{method}/{ds_name}/{shots}shot"
        for attempt in (1, 2):
            try:
                cells[key] = run_cell(method, ds_name, k, shots)
                print(f"# {key}: {cells[key]:.1f}s", file=sys.stderr)
                break
            except Exception as e:
                print(f"# {key}: attempt {attempt} FAILED: {e!r}",
                      file=sys.stderr)
                if attempt == 2:
                    failed[key] = repr(e)
                else:
                    wait_for_backend()
        partial_path.write_text(json.dumps(
            {"cells": {k_: round(v, 1) for k_, v in cells.items()},
             "failed": failed}
        ) + "\n")

    # BENCH_METHODS_ONLY="Adapter-CoCoOp/caltech101_like" runs matching
    # cells alone (crash triage: fresh-process single-cell isolation)
    only = [s for s in
            os.environ.get("BENCH_METHODS_ONLY", "").split(",") if s]

    def _selected(method, ds_name):
        return not only or any(f"{method}/{ds_name}".startswith(s)
                               for s in only)

    for method in METHODS_3:
        for ds_name, k in DATASETS_3.items():
            for shots in SHOTS:
                if _selected(method, ds_name):
                    run_cell_guarded(method, ds_name, k, shots)
    for method in METHODS_4:
        for ds_name, k in DATASETS_4.items():
            for shots in SHOTS:
                if _selected(method, ds_name):
                    run_cell_guarded(method, ds_name, k, shots)

    trials_run = len(cells) * len(SEEDS)
    total_s = sum(cells.values())
    # full-suite projection: measured mean group time per family × the full
    # grid's group count (16-shot groups are the most expensive cell — more
    # union images to decode/encode — so projecting lower shot counts at the
    # measured mean over-counts: conservative)
    mean_3 = (
        sum(v for k_, v in cells.items()
            if k_.split("/")[0] in METHODS_3) /
        max(1, sum(1 for k_ in cells if k_.split("/")[0] in METHODS_3))
    )
    groups_3 = len(METHODS_3) * FULL_SUITE_DATASETS_3 * FULL_SUITE_SHOTS
    proj_3 = mean_3 * groups_3
    payload = {
        "metric": "baseline34_sweep_vmap",
        "seeds": len(SEEDS),
        "epochs": EPOCHS,
        "prompt_epochs": PROMPT_EPOCHS,
        "shots_measured": SHOTS,
        "trials_run": trials_run,
        "trials_per_s": round(trials_run / total_s, 3),
        "measured_total_s": round(total_s, 1),
        "group_s_by_cell": {k_: round(v, 1) for k_, v in cells.items()},
        "config3_projection_min": round(proj_3 / 60, 1),
        "config3_projection_note": (
            f"{groups_3} groups (3 methods x 3 datasets x 5 shot-counts) at "
            "the measured mean group time; 16-shot measured cells are the "
            "most expensive, so this over-counts lower-shot cells"
        ),
        # run_cell calls trial_vmap.run_vmapped_trials directly (no sweep
        # router, hence no fallback path exists): every cell in
        # group_s_by_cell ran vmapped by construction; cells that failed
        # outright (for any reason — crash, OOM, backend wedge) are listed
        # separately in failed_cells, not conflated with fallbacks
        "zero_vmap_fallbacks": True,
        "backend": jax.default_backend(),
        "dataset_gen_s": round(gen_s, 1),
    }
    if failed:
        payload["failed_cells"] = failed
    if os.environ.get("BENCH_METHODS_SMOKE") == "1":
        payload["smoke"] = True  # reduced grid — projections not meaningful
    if METHODS_4:
        mean_4 = {
            m: (sum(v for k_, v in cells.items() if k_.startswith(m + "/")) /
                max(1, sum(1 for k_ in cells if k_.startswith(m + "/"))))
            for m in METHODS_4
        }
        proj_4 = sum(
            mean_4[m] * FULL_SUITE_DATASETS_4 * FULL_SUITE_SHOTS
            for m in METHODS_4
        )
        payload["config4_projection_min"] = round(proj_4 / 60, 1)
        payload["config4_projection_note"] = (
            f"{len(METHODS_4)} prompt method(s) x {FULL_SUITE_DATASETS_4} "
            f"datasets x {FULL_SUITE_SHOTS} shot-counts at each method's "
            "measured mean group time over representative class counts "
            f"(10/47/100/101/102) at {PROMPT_EPOCHS} epochs (group time "
            "scales ~linearly in epochs); ImageNet-scale K not re-run per "
            "bench. The 100/101/102 cells share the 102 K-bucket "
            "(parallel/k_bucket.py): the first pays the bucket's compile, "
            "the other two run warm, so this mean includes the "
            "amortization the full suite would see."
        )
        # bucket-amortization witness: within the 102 bucket, cells after
        # the first should be warm-dominated (no per-K recompile)
        payload["k_bucket_trio_s"] = {
            f"{m}/{ds}": round(cells[key], 1)
            for m in METHODS_4
            for ds in ("caltech101_like", "food101_like", "flowers_like")
            for key in (f"{m}/{ds}/{SHOTS[0]}shot",)
            if key in cells
        }
    if only:
        payload["cells_filtered_by"] = only  # triage run, partial grid
    out = json.dumps(payload)
    # never clobber the artifact with a smoke or filtered triage run
    if not payload.get("smoke") and not only:
        (REPO / "BENCH_sweep_methods.json").write_text(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
