"""Grid experiment runner (ref: utils/hparam_search.py).

Same experiment-YAML contract: ``datasets``/``seeds``/``shots``/``grid``
Cartesian expansion, human-readable trial signatures, ``template`` output-dir
formatting, skip-if-``log.txt``-exists resumability, OK/FAIL progress lines.

Execution backends, replacing per-GPU subprocess pinning:
- ``inprocess`` (default): trials run sequentially inside one process. On TPU
  this is the fast path — the XLA executables and CLIP weights persist across
  trials, so each trial after the first skips all compilation; a whole sweep
  behaves like one long program. Per-trial stdout is teed into each trial's
  ``log.txt``.
- ``subprocess``: reference-style isolation, one ``train.py`` child per trial,
  with a worker pool of ``--jobs-per-device`` × devices. Use for multi-host
  dispatch or fault isolation.
"""

from __future__ import annotations

import argparse
import itertools
import os
import queue
import subprocess
import sys
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import functools

import yaml


def _no_extraction_sharding(fn):
    """Disable the trainer's multi-device batch-sharded feature extraction
    (parallel/mesh.maybe_sharded_encode) for the duration of a sweep run.

    A sweep's parallelism axis is trials/groups-over-devices, not the batch
    axis of one trial — a per-trial encode that grabs the whole mesh would
    fight the group-parallel scheduler. It also keeps the bit-identical
    guarantee between sequential and group-parallel sweeps (the sharded and
    single-device extraction executables differ at ULP level, and pinned
    workers can never shard). Subprocess-backend children inherit the env."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        prev = os.environ.get("CLIP_GP_TPU_SHARD_EXTRACTION")
        os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"] = "0"
        try:
            return fn(*args, **kwargs)
        finally:
            if prev is None:
                os.environ.pop("CLIP_GP_TPU_SHARD_EXTRACTION", None)
            else:
                os.environ["CLIP_GP_TPU_SHARD_EXTRACTION"] = prev

    return wrapped


DATASET_NAME_MAP = {
    "caltech101": "Caltech101",
    "oxford_pets": "OxfordPets",
    "oxford_flowers": "OxfordFlowers",
    "fgvc_aircraft": "FGVCAircraft",
    "dtd": "DescribableTextures",
    "eurosat": "EuroSAT",
    "stanford_cars": "StanfordCars",
    "food101": "Food101",
    "sun397": "SUN397",
    "ucf101": "UCF101",
    "imagenet": "ImageNet",
    "imagenet_sketch": "ImageNetSketch",
    "imagenetv2": "ImageNetV2",
    "imagenet_a": "ImageNetA",
    "imagenet_r": "ImageNetR",
    "synthetic": "Synthetic",
}


@dataclass
class Trial:
    index: int
    dataset: str
    seed: int
    shots: int
    dataset_cfg: str
    output_root: Path
    output_template: str
    grid_overrides: Dict[str, Any]
    root_override: Optional[str]
    experiment_name: str
    config_file: str
    extra_env: Dict[str, str] = field(default_factory=dict)

    def signature(self) -> str:
        if not self.grid_overrides:
            return ""
        return "_".join(
            f"{k.split('.')[-1]}{v}" for k, v in sorted(self.grid_overrides.items())
        )

    def format_outdir(self) -> Path:
        placeholders = {
            "sweep": self.experiment_name,
            "experiment": self.experiment_name,
            "dataset": self.dataset,
            "shots": self.shots,
            "seed": self.seed,
            "sig": self.signature(),
        }
        placeholders.update(self.grid_overrides)
        return (self.output_root / self.output_template.format(**placeholders)).resolve()

    def to_argv(self) -> List[str]:
        out_dir = self.format_outdir()
        out_dir.mkdir(parents=True, exist_ok=True)
        argv = [
            "--dataset-config-file", self.dataset_cfg,
            "--config-file", self.config_file,
            "--dataset", DATASET_NAME_MAP.get(self.dataset.lower(), self.dataset),
            "--seed", str(self.seed),
            "--output-dir", str(out_dir),
        ]
        if self.root_override:
            argv += ["--root", self.root_override]
        for k, v in sorted(self.grid_overrides.items()):
            argv += [k, str(v)]
        argv += ["DATASET.NUM_SHOTS", str(self.shots)]
        return argv


# Top-level keys the experiment YAML contract defines (ref:
# utils/hparam_search.py:146-160). The same YAML is also passed to train.py
# as --config-file, so merge_config_dict (core/config.py) consumes two more
# classes of key in EVERY trial: uppercase keys (embedded trainer config) and
# lowercase keys naming a config section (optim:, dataset:, ...) or a
# top-level Config field (seed:, resume:, ...). Only keys in none of those
# classes are truly ignored — warn so a typoed `opts:` doesn't silently run
# the wrong experiment, and flag section/field names that merge as trainer
# config since that is rarely what a sweep author intended at this level.
_EXPERIMENT_KEYS = {
    "name", "datasets", "seeds", "shots", "dataset_config", "output_root",
    "grid", "template", "root", "devices", "__config_file__",
}


def _trainer_config_keys() -> set:
    """Lowercase keys merge_config_dict consumes as trainer config."""
    import dataclasses as _dc

    from ..core import config as _config_mod

    fields = {f.name for f in _dc.fields(_config_mod.Config)}
    return set(_config_mod._SECTIONS) | fields


def build_trials(cfg: Dict[str, Any]) -> Tuple[List[Trial], Dict[str, Any]]:
    trainer_keys = _trainer_config_keys()
    for key in cfg:
        if key in _EXPERIMENT_KEYS or key[:1].isupper():
            continue
        if key.lower() in trainer_keys:
            print(
                f"[WARN] experiment key {key!r} merges as trainer config in "
                "every trial (it names a config section or field; move it "
                "under an uppercase section or remove it if unintended)"
            )
        else:
            print(
                f"[WARN] unknown experiment key {key!r} ignored (known keys: "
                f"{sorted(_EXPERIMENT_KEYS - {'__config_file__'})}; uppercase "
                "keys merge as embedded trainer config)"
            )
    name = cfg.get("name") or "experiment"
    datasets = cfg.get("datasets")
    if isinstance(datasets, str):
        datasets = [datasets]
    seeds = list(cfg.get("seeds", [1]))
    shots = list(cfg.get("shots", [1]))
    output_root = Path(cfg.get("output_root", "output"))
    grid: Dict[str, Any] = cfg.get("grid") or {}
    template = cfg.get("template", "{experiment}/{dataset}/{sig}/seed{seed}")
    keys = list(grid.keys())
    values = [grid[k] if isinstance(grid[k], list) else [grid[k]] for k in keys]
    trials: List[Trial] = []
    for ds in datasets:
        dataset_cfg = cfg.get("dataset_config") or f"configs/datasets/{ds}.yaml"
        for seed in seeds:
            for nshot in shots:
                for combo in itertools.product(*values) if keys else [()]:
                    trials.append(
                        Trial(
                            index=len(trials),
                            dataset=ds,
                            seed=int(seed),
                            shots=int(nshot),
                            dataset_cfg=dataset_cfg,
                            output_root=output_root,
                            output_template=template,
                            grid_overrides=dict(zip(keys, combo)),
                            root_override=cfg.get("root"),
                            experiment_name=name,
                            config_file=str(cfg.get("__config_file__", "")),
                        )
                    )
    return trials, {"experiment_name": name, "n_trials": len(trials)}


def pending_trials(trials: List[Trial], skip_logged: bool = True) -> List[Trial]:
    out = []
    for t in trials:
        if skip_logged and (t.format_outdir() / "log.txt").exists():
            print(
                f"[SKIP] Existing log found, skipping: dataset={t.dataset} "
                f"shots={t.shots} seed={t.seed} sig={t.signature()}"
            )
            continue
        out.append(t)
    return out


@_no_extraction_sharding
def run_trials_inprocess(trials: List[Trial]) -> List[Dict[str, Any]]:
    """Sequential in-process execution with persistent jit caches."""
    from clip_gp_tpu.core.logging import reset_tee

    results = []
    total = len(trials)
    for i, trial in enumerate(trials):
        import train as train_main

        rc = 0
        try:
            train_main.main(trial.to_argv())
        except Exception as e:  # a failed trial must not kill the sweep
            import traceback

            traceback.print_exc()
            print(f"[ERROR] trial failed: {e}")
            rc = 1
        finally:
            reset_tee()
        status = "OK" if rc == 0 else "FAIL"
        print(
            f"[{i + 1}/{total}] {status} dataset={trial.dataset} "
            f"shots={trial.shots} seed={trial.seed} config={trial.signature()}"
        )
        results.append(
            {
                "index": trial.index,
                "dataset": trial.dataset,
                "seed": trial.seed,
                "shots": trial.shots,
                "sig": trial.signature(),
                "out_dir": str(trial.format_outdir()),
                "return_code": rc,
            }
        )
    return results


# grid keys whose values can join the vmap axis live on each MethodSpec
# (trial_vmap.vmappable_config_keys — one source of truth with the specs'
# supported_hparams); fetched lazily so importing sweep.py stays jax-free


def _vmap_supported(config, group_size: int) -> bool:
    """Can this trial group train as one vmapped program?

    All six tiny-state heads qualify (Adapter, CLIP-Adapter, TaskRes,
    Tip-Adapter-F, CoOp, CoCoOp), including the GP / template-weight
    pre-stage variants (the pre-stages themselves run as vmapped per-trial
    fits — trial_vmap.vmapped_{gp,tw}_prestage). CoCoOp's ctx + meta-net
    are trial-shaped; its per-image prompt encodes batch across the trial
    axis inside the vmapped loss (trial_vmap.CoCoOpSpec)."""
    a = config.adapter
    name = str(config.trainer_name)
    if group_size < 2:
        return False
    if name == "Adapter":
        # any trainable head vmaps (GP / per-class logits / linear [D,1]
        # head), incl. freeze_visual_proj (W dropped from the trial pytree)
        # and shared_template_weights (an init-only difference); only the
        # non-trainable uniform baseline stays in-process
        return bool(
            a.use_gp
            or a.train_template_weights
            or a.use_linear_template_weighting
        )
    if name in ("CLIP-Adapter", "TaskRes"):
        return True
    if name == "Tip-Adapter":
        return bool(a.tip_adapter_trainable)  # only the trainable -F variant
    if name == "Adapter-CoOp":
        # ctx (incl. csc / ctx_init variants) vmaps; the text tower runs
        # inside the loss batched over T·K prompts (trial_vmap.CoOpSpec)
        return True
    if name == "Adapter-CoCoOp":
        # ctx + meta-net vmap; the per-image conditional prompt encodes
        # batch [T·C·K] prompts per tower call (trial_vmap.CoCoOpSpec)
        return True
    return False


def _group_trial_mesh(n_trials: int, devices, requested: int):
    """Build a ``Mesh(axis='trial')`` for one trial group: the largest
    divisor of the group size that fits the device budget (the [T, ...]
    trial axis shards evenly or not at all — NamedSharding placement).
    Returns None when only one device would participate."""
    cap = min(int(requested), len(devices))
    m = 1
    for d in range(2, cap + 1):
        if n_trials % d == 0:
            m = d
    if m < 2:
        return None
    import numpy as _np
    from jax.sharding import Mesh

    return Mesh(_np.array(devices[:m]), ("trial",))


@_no_extraction_sharding
def run_trials_vmapped(
    trials: List[Trial], strict: bool = False,
    group_parallel: Optional[int] = None,
    trial_mesh: Optional[int] = None,
) -> List[Dict[str, Any]]:
    """Group trials that differ only by seed (or vmappable scalar grid cells)
    and train each group as one vmapped program. Supported methods: Adapter,
    CLIP-Adapter, TaskRes, Tip-Adapter-F, CoOp, CoCoOp. Non-groupable trials fall back to
    in-process sequential execution; with ``strict`` a vmapped-group failure
    raises instead of silently degrading the sweep to the slow path.

    ``group_parallel``: run up to N trial groups concurrently, each pinned to
    its own local device via ``jax.default_device`` — the TPU-native analog of
    the reference's per-GPU subprocess pinning (ref:
    utils/hparam_search.py:201-258), with threads instead of processes so the
    XLA executables and feature memo stay shared. Groups are assigned to
    workers *per dataset* (dataset-sticky), so each dataset's eval split is
    encoded once on one device. Default (None) = one worker per local device,
    capped by the dataset count; 1 = sequential (single-chip behavior).

    ``trial_mesh``: shard each group's [T, ...] trial axis over up to N local
    devices (the TPU-native analog of the reference's ``--devices`` trial
    scheduling, ref: utils/hparam_search.py:201-281, as pure placement: trials
    never communicate, so XLA inserts no collectives — top-1 predictions are
    identical to unsharded; calibration metrics agree to float tolerance, as
    XLA tiles the [T/m, ...] shard program differently and reduction order
    shifts at ULP level). Mutually exclusive with ``group_parallel`` > 1 — they are
    opposite ways to spend the same chips: trial-mesh splits ONE group across
    devices (wins when one large seed×grid group dominates, or when the host
    can only feed one decode pipeline), group-parallel runs DIFFERENT groups
    on different devices (wins for many-(dataset, shots)-cell sweeps on
    many-core hosts, where each worker gets its own decode threads). Groups
    whose size shares no divisor ≥ 2 with the device budget run unsharded."""
    if trial_mesh and group_parallel and group_parallel > 1:
        raise ValueError(
            "--trial-mesh and --group-parallel are mutually exclusive: "
            "the first shards one group over all devices, the second pins "
            "whole groups to single devices"
        )
    from clip_gp_tpu.core.config import Config, merge_config_from_file, merge_from_opts
    from clip_gp_tpu.parallel.trial_vmap import (
        run_vmapped_trials,
        vmappable_config_keys,
    )

    vmappable_keys = vmappable_config_keys()

    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    groups: Dict[tuple, List[Trial]] = {}
    configs: Dict[tuple, Any] = {}
    for t in trials:
        config = Config()
        merge_config_from_file(config, t.dataset_cfg)
        merge_config_from_file(config, t.config_file)
        for k, v in sorted(t.grid_overrides.items()):
            merge_from_opts(config, [k, str(v)])
        config.dataset.num_shots = t.shots
        config.dataset.name = DATASET_NAME_MAP.get(t.dataset.lower(), t.dataset)
        if t.root_override:
            config.dataset.root = t.root_override
        vmappable = vmappable_keys.get(str(config.trainer_name), {})
        if all(k in vmappable for k in t.grid_overrides):
            # seeds AND scalar grid cells share one vmapped program
            key = (t.dataset, t.shots, str(config.trainer_name))
        else:
            key = (t.dataset, t.shots, str(config.trainer_name), t.signature())
        groups.setdefault(key, []).append(t)
        configs.setdefault(key, config)

    results: List[Dict[str, Any]] = []
    leftovers: List[Trial] = []
    n_fallback_groups = 0

    import jax

    # Would this sweep schedule groups concurrently (workers pinned to
    # devices)? CoCoOp's in-process routing below must not demote groups out
    # of a parallel schedule: in-process trials consume the global RNG
    # (reference sampling parity) and can only run sequentially, so routing
    # is a win only where the scheduler is sequential anyway (one device, or
    # a single-dataset bucket). Over-counting datasets errs toward keeping
    # the vmapped path (measured ~parity warm), never toward losing chips.
    n_sweep_datasets = len({g[0].dataset for g in groups.values()})
    parallel_scheduler = (group_parallel or 0) > 1 or (
        not trial_mesh
        and len(jax.local_devices()) > 1
        and n_sweep_datasets > 1
    )

    work_items: List[Tuple] = []
    for key, group in groups.items():
        config = configs[key]
        method = str(config.trainer_name)
        if not _vmap_supported(config, len(group)):
            # head variants the vmapped runner doesn't model train in-process
            leftovers.extend(group)
            continue
        vmappable = vmappable_keys[method]
        seeds = [t.seed for t in group]
        overrides = [
            {vmappable[k]: v for k, v in t.grid_overrides.items()
             if k in vmappable}
            for t in group
        ]
        outdirs = [t.format_outdir() for t in group]
        for d in outdirs:
            d.mkdir(parents=True, exist_ok=True)
        mesh = None
        if trial_mesh:
            mesh = _group_trial_mesh(
                len(group), jax.local_devices(), trial_mesh
            )
            if mesh is not None:
                print(
                    f"[vmap] trial-mesh: group {key} shards {len(group)} "
                    f"trial(s) over {mesh.devices.size} device(s)"
                )
            else:
                print(
                    f"[vmap] trial-mesh: group {key} ({len(group)} trials) "
                    "has no divisor >= 2 within the device budget; running "
                    "unsharded"
                )
        if (
            method == "Adapter-CoCoOp"
            and mesh is None
            and not strict
            and not parallel_scheduler
            and os.environ.get("CLIP_GP_TPU_VMAP_COCOOP") != "1"
        ):
            # MEASURED routing (BENCH_cocoop_vmap.json; re-measured
            # 2026-08-21 post-prompt-trim): a warm vmapped CoCoOp group ≈
            # T warm sequential trials (0.96× pre-trim, 1.1× post-trim at
            # T=5, K=50) — the per-step prompt batch B·K is already
            # MXU-sized in-process, so the trial axis amortizes little —
            # while the vmapped group COLD costs ~2× the in-process group
            # cold (243.5 vs 119.8 s post-trim). Trial-vmapping CoCoOp
            # pays off when the trial axis buys chip-parallelism (or when
            # K-bucketing lets many cells share the vmapped compile), so
            # on a single chip these groups run in-process; --trial-mesh
            # (with a usable mesh), --strict-vmap, or
            # CLIP_GP_TPU_VMAP_COCOOP=1 selects the vmapped path. A
            # parallel schedule (multi-device default or --group-parallel)
            # also keeps vmap: in-process trials are global-RNG
            # sequential, so routing there would trade chips for a
            # measured ~1.1x warm win.
            print(
                f"[vmap] group {key}: Adapter-CoCoOp routes to the "
                "in-process backend on a single chip (measured: warm "
                "vmapped group ~= sequential trials, cold pays ~2x; "
                "BENCH_cocoop_vmap.json). --trial-mesh, "
                "--strict-vmap or CLIP_GP_TPU_VMAP_COCOOP=1 forces vmap."
            )
            leftovers.extend(group)
            continue
        work_items.append(
            (key, group, config, method, seeds, overrides, outdirs, mesh)
        )

    lock = threading.Lock()
    strict_errors: List[BaseException] = []

    def _run_group(item, prefetched=None, start_next=None) -> None:
        nonlocal n_fallback_groups
        key, group, config, method, seeds, overrides, outdirs, mesh = item
        try:
            if prefetched is not None:
                # adopt the decode-ahead runner: its splits are sampled and
                # its union decode is streaming (or done) already
                prefetched.runner.on_before_train = start_next
                prefetched.runner.run(outdirs)
            else:
                run_vmapped_trials(
                    config, seeds, outdirs, trial_overrides=overrides,
                    method=method, on_before_train=start_next, mesh=mesh,
                )
        except Exception as e:
            import traceback

            if prefetched is not None:
                prefetched.cancel()
            traceback.print_exc()
            with lock:
                if strict:
                    strict_errors.append(
                        RuntimeError(
                            f"vmapped group {key} failed under --strict-vmap"
                        )
                    )
                    return
                n_fallback_groups += 1
                print(
                    f"[ERROR] vmapped group {key} failed ({e}); "
                    "falling back to in-process (use --strict-vmap to error)"
                )
                leftovers.extend(group)
            return
        with lock:
            for t in group:
                (t.format_outdir() / "log.txt").touch()  # skip-if-done
                results.append(
                    {
                        "index": t.index,
                        "dataset": t.dataset,
                        "seed": t.seed,
                        "shots": t.shots,
                        "sig": t.signature(),
                        "out_dir": str(t.format_outdir()),
                        "return_code": 0,
                    }
                )
                print(
                    f"[vmap] OK method={method} dataset={t.dataset} "
                    f"shots={t.shots} seed={t.seed} config={t.signature()}"
                )

    # dataset-sticky buckets: all of a dataset's groups run on one worker so
    # its eval split is memo-encoded once, on that worker's device
    buckets: Dict[Any, List[Tuple]] = {}
    for item in work_items:
        buckets.setdefault(item[1][0].dataset, []).append(item)

    if group_parallel:
        # explicit: workers may outnumber devices — co-resident groups
        # software-pipeline a chip (one group's host decode overlaps another's
        # device training; the in-flight memo lock stops duplicate eval
        # encodes). If the dataset count can't feed that many workers, split
        # buckets down to (dataset, shots).
        n_workers = max(1, group_parallel)
        if n_workers > len(buckets):
            buckets = {}
            for item in work_items:
                buckets.setdefault(
                    (item[1][0].dataset, item[1][0].shots), []
                ).append(item)
        n_workers = min(n_workers, len(buckets) or 1)
    elif trial_mesh:
        # groups spread over the devices' trial axis — the scheduler itself
        # stays sequential (decode-ahead still overlaps the next group's host
        # decode with the current group's sharded executable)
        n_workers = 1
    else:
        n_workers = max(
            1, min(len(jax.local_devices()), len(buckets) or 1)
        )
    if n_workers <= 1:
        # decode-ahead (1-deep): while group g's whole-run executable holds
        # the device, group g+1's splits sample and its union decodes on the
        # otherwise-idle host CPU — group time tends to max(decode, train)
        # instead of decode+train. Single-producer by construction (unlike
        # --group-parallel, which contends two decode pools for one CPU and
        # measured slower on 1-core hosts). CLIP_GP_TPU_DISABLE_DECODE_PREFETCH=1
        # restores the strictly sequential path.
        prefetch_on = (
            os.environ.get("CLIP_GP_TPU_DISABLE_DECODE_PREFETCH") != "1"
            and len(work_items) > 1
        )
        pfs: List[Any] = [None] * len(work_items)

        def _starter(i: int):
            def _start() -> None:
                j = i + 1
                if not prefetch_on or j >= len(work_items) or pfs[j] is not None:
                    return
                (_, _, cfg_j, method_j, seeds_j, overrides_j, _,
                 mesh_j) = work_items[j]
                try:
                    from clip_gp_tpu.parallel.trial_vmap import DecodePrefetcher

                    pfs[j] = DecodePrefetcher(
                        cfg_j, seeds_j, trial_overrides=overrides_j,
                        method=method_j, mesh=mesh_j,
                    ).start()
                    print(
                        f"[vmap] decode-ahead: prefetching group "
                        f"{j + 1}/{len(work_items)}"
                    )
                except Exception:
                    pfs[j] = None  # the real run will reproduce + report it

            return _start

        for i, item in enumerate(work_items):
            _run_group(item, prefetched=pfs[i], start_next=_starter(i))
            if strict_errors:
                for pf in pfs:
                    if pf is not None and not pf.consumed:
                        pf.cancel()
                raise strict_errors[0]
    else:
        devices = jax.local_devices()
        print(
            f"[vmap] scheduling {len(work_items)} trial group(s) over "
            f"{n_workers} worker(s) / {len(devices)} device(s)"
        )

        def _worker(wid: int, my_items: List[Tuple]) -> None:
            dev = devices[wid % len(devices)]
            for item in my_items:
                with lock:
                    aborted = bool(strict_errors)
                if aborted:
                    return
                with jax.default_device(dev):
                    _run_group(item)

        assignments: List[List[Tuple]] = [[] for _ in range(n_workers)]
        for i, ds in enumerate(sorted(buckets)):
            assignments[i % n_workers].extend(buckets[ds])
        threads = [
            threading.Thread(target=_worker, args=(i, items), daemon=True)
            for i, items in enumerate(assignments)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if strict_errors:
            raise strict_errors[0]
        results.sort(key=lambda r: r["index"])

    if n_fallback_groups:
        print(
            f"[vmap] WARNING: {n_fallback_groups} group(s) fell back to the "
            "in-process backend after vmapped failures"
        )
    if leftovers:
        print(
            f"[vmap] {len(leftovers)} trial(s) not vmap-groupable; "
            "running in-process"
        )
        results.extend(run_trials_inprocess(leftovers))
    return results


@_no_extraction_sharding
def run_trials_subprocess(
    trials: List[Trial],
    devices: List[str],
    jobs_per_device: int,
    verbose: bool = False,
    launcher: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """Reference-style process-per-trial worker pool
    (ref: utils/hparam_search.py:209-281).

    ``launcher``: optional command-prefix template for multi-host (DCN)
    dispatch — each trial's command becomes
    ``launcher.format(device=<assigned device>).split() + [python train.py …]``
    (e.g. ``--devices host1,host2 --launcher "ssh {device}"`` fans trials out
    over hosts; the remote side needs the repo + env on its PATH). With no
    launcher, ``devices`` round-robins via the CLIP_GP_TPU_DEVICE env var
    exactly like the reference's CUDA_VISIBLE_DEVICES pinning."""
    results: List[Dict[str, Any]] = []
    total = len(trials)
    completed = {"n": 0}
    task_q: "queue.Queue[Trial]" = queue.Queue()
    for i, t in enumerate(trials):
        if devices:
            t.extra_env["CLIP_GP_TPU_DEVICE"] = devices[i % len(devices)]
        task_q.put(t)
    lock = threading.Lock()
    dev_ids = devices or [""]
    semaphores = {d: threading.Semaphore(max(1, jobs_per_device)) for d in dev_ids}
    n_threads = max(1, len(dev_ids) * max(1, jobs_per_device))
    train_py = str(Path(__file__).resolve().parents[2] / "train.py")

    def worker():
        while True:
            try:
                trial = task_q.get_nowait()
            except queue.Empty:
                return
            dev = trial.extra_env.get("CLIP_GP_TPU_DEVICE", "")
            sem = semaphores.get(dev, semaphores[dev_ids[0]])
            with sem:
                env = os.environ.copy()
                env.update(trial.extra_env)
                cmd = [sys.executable, train_py] + trial.to_argv()
                if launcher:
                    cmd = launcher.format(device=dev).split() + cmd
                kwargs = (
                    {}
                    if verbose
                    else {"stdout": subprocess.DEVNULL, "stderr": subprocess.DEVNULL}
                )
                rc = subprocess.call(cmd, env=env, **kwargs)
                with lock:
                    completed["n"] += 1
                    status = "OK" if rc == 0 else "FAIL"
                    print(
                        f"[{completed['n']}/{total}] {status} "
                        f"dataset={trial.dataset} shots={trial.shots} "
                        f"seed={trial.seed} config={trial.signature()}"
                    )
                    results.append(
                        {
                            "index": trial.index,
                            "dataset": trial.dataset,
                            "seed": trial.seed,
                            "shots": trial.shots,
                            "sig": trial.signature(),
                            "out_dir": str(trial.format_outdir()),
                            "return_code": rc,
                        }
                    )
            task_q.task_done()

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    return results


def main(argv=None):
    # Same CPU-pinning contract as train.py: the axon TPU plugin ignores
    # JAX_PLATFORMS, and initializing a wedged tunnel hangs forever — the
    # in-process/vmap backends run jax in THIS process, so honor the env
    # before anything initializes a backend.
    if os.environ.get("CLIP_GP_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description="Run grid experiments")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--devices", default=None,
                    help="comma-separated device ids (subprocess backend)")
    ap.add_argument("--jobs-per-gpu", "--jobs-per-device", type=int, default=1,
                    dest="jobs_per_device")
    ap.add_argument("--experiment-name", default=None)
    ap.add_argument("--backend", choices=["inprocess", "subprocess", "vmap"],
                    default="inprocess")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--no-skip-logged", action="store_true")
    ap.add_argument(
        "--strict-vmap", action="store_true",
        help="error out if a vmapped trial group fails instead of silently "
             "falling back to the in-process backend",
    )
    ap.add_argument(
        "--launcher", default=None,
        help="subprocess-backend command prefix template for multi-host "
             "dispatch, e.g. 'ssh {device}' with --devices host1,host2",
    )
    ap.add_argument(
        "--group-parallel", type=int, default=None,
        help="vmap backend: run up to N trial groups concurrently, one per "
             "local device (default: one worker per device, dataset-sticky; "
             "1 = sequential)",
    )
    ap.add_argument(
        "--trial-mesh", nargs="?", const="auto", default=None,
        help="vmap backend: shard each trial group's [T, ...] state over a "
             "Mesh of up to N local devices ('auto' or no value = all local "
             "devices). Pure placement, no collectives: top-1 identical to "
             "unsharded, calibration metrics within float tolerance. "
             "Mutually exclusive with --group-parallel: trial-mesh splits "
             "ONE group across chips (best when one big seed x grid group "
             "dominates or the host can only feed one decode pipeline); "
             "group-parallel runs DIFFERENT groups on different chips (best "
             "for many-cell sweeps on many-core hosts)",
    )
    args = ap.parse_args(argv)
    trial_mesh = None
    if args.trial_mesh is not None:
        if args.backend != "vmap":
            ap.error("--trial-mesh requires --backend vmap")
        if str(args.trial_mesh).lower() == "auto":
            trial_mesh = 1 << 30  # capped at len(jax.local_devices())
        else:
            try:
                trial_mesh = int(args.trial_mesh)
            except ValueError:
                ap.error(
                    f"--trial-mesh expects an integer or 'auto', got "
                    f"{args.trial_mesh!r}"
                )
            if trial_mesh < 2:
                ap.error("--trial-mesh needs >= 2 devices (or 'auto')")

    t0 = time.time()
    config_path = Path(args.config_file)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["__config_file__"] = str(config_path)
    if args.experiment_name:
        cfg["name"] = args.experiment_name
    elif not cfg.get("name"):
        cfg["name"] = config_path.stem

    trials, meta = build_trials(cfg)
    todo = pending_trials(trials, skip_logged=not args.no_skip_logged)
    # device hints: experiment-YAML key first, CLI flag as fallback
    # (ref: utils/hparam_search.py:159 — cfg.get("devices") or cli_devices)
    dev_str = cfg.get("devices") or args.devices or ""
    devices = [d.strip() for d in str(dev_str).split(",") if d.strip()]
    if args.backend == "vmap":
        run_trials_vmapped(
            todo, strict=args.strict_vmap, group_parallel=args.group_parallel,
            trial_mesh=trial_mesh,
        )
    elif args.backend == "subprocess" or devices:
        run_trials_subprocess(
            todo, devices, args.jobs_per_device, args.verbose,
            launcher=args.launcher,
        )
    else:
        run_trials_inprocess(todo)
    exp = meta["experiment_name"]
    out = trials[0].output_root / exp if trials else Path("output") / exp
    print(f"Experiment complete: {exp} -> {out}")
    print(f"Completed in {time.time() - t0} seconds")


if __name__ == "__main__":
    main()
