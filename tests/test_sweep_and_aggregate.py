"""Sweep runner trial expansion + skip-if-done, and aggregator outputs."""

import json
import textwrap
from pathlib import Path

from clip_gp_tpu.parallel.sweep import build_trials, pending_trials
from clip_gp_tpu.reporting import aggregate


def _experiment_cfg(tmp_path):
    return {
        "name": "exp1",
        "datasets": ["caltech101", "eurosat"],
        "seeds": [1, 2],
        "shots": [1, 4],
        "output_root": str(tmp_path / "output"),
        "template": "{experiment}/{dataset}/GP_{shots}shots{sig}/seed{seed}",
        "grid": {"TRAINER.ADAPTER.GP_BETA": [0.01, 0.1]},
        "__config_file__": "configs/trainers/gp.yaml",
    }


def test_trial_expansion_and_signature(tmp_path):
    trials, meta = build_trials(_experiment_cfg(tmp_path))
    assert meta["n_trials"] == 2 * 2 * 2 * 2  # ds x seeds x shots x grid
    t = trials[0]
    assert t.signature() == "GP_BETA0.01"
    out = t.format_outdir()
    assert "exp1/caltech101/GP_1shotsGP_BETA0.01/seed1" in str(out)
    argv = t.to_argv()
    assert "--dataset" in argv
    assert argv[argv.index("--dataset") + 1] == "Caltech101"
    assert "DATASET.NUM_SHOTS" in argv
    assert "TRAINER.ADAPTER.GP_BETA" in argv


def test_unknown_experiment_key_warns(tmp_path, capsys):
    """A typoed lowercase experiment key (e.g. `opts:`) would otherwise be
    silently dropped by both the runner and the trainer-config merge;
    uppercase keys are embedded trainer config and stay silent."""
    cfg = _experiment_cfg(tmp_path)
    cfg["opts"] = {"TRAINER.ADAPTER.GP_BETA": 1.0}
    cfg["TRAINER"] = {"NAME": "Adapter"}
    build_trials(cfg)
    out = capsys.readouterr().out
    assert out.count("[WARN] unknown experiment key") == 1
    assert "[WARN] unknown experiment key 'opts'" in out
    assert "'TRAINER'" not in out


def test_trainer_config_experiment_key_warns_as_merge(tmp_path, capsys):
    """Lowercase keys naming a config section or Config field DO merge as
    trainer config when the YAML reaches train.py (core/config.py
    merge_config_dict) — the warning must say so, not claim they are
    ignored."""
    cfg = _experiment_cfg(tmp_path)
    cfg["seed"] = 7
    cfg["optim"] = {"LR": 0.5}
    build_trials(cfg)
    out = capsys.readouterr().out
    assert out.count("merges as trainer config") == 2
    assert "'seed'" in out and "'optim'" in out
    assert "[WARN] unknown experiment key" not in out


def test_skip_if_done(tmp_path):
    trials, _ = build_trials(_experiment_cfg(tmp_path))
    done = trials[0].format_outdir()
    done.mkdir(parents=True)
    (done / "log.txt").write_text("done")
    todo = pending_trials(trials)
    assert len(todo) == len(trials) - 1


def _write_run(root, exp, ds, cfg, seed, shots, acc, ece, zs_acc=50.0):
    d = root / exp / ds / cfg / f"seed{seed}"
    d.mkdir(parents=True, exist_ok=True)
    payload = {
        "dataset": ds,
        "shots": shots,
        "seed": seed,
        "method": "gp",
        "backbone": "RN50",
        "zero_shot": {"top1_acc": zs_acc, "ece": 10.0, "aece": 9.0},
        "metrics": {"top1_acc": acc, "ece": ece, "aece": ece + 1},
    }
    (d / "metrics.json").write_text(json.dumps(payload))


def test_aggregate_end_to_end(tmp_path, capsys):
    root = tmp_path / "output"
    for ds in ("caltech101", "eurosat"):
        for shots in (1, 4):
            for seed in (1, 2):
                _write_run(
                    root, "exp1", ds, f"GP_{shots}shots", seed, shots,
                    acc=60.0 + shots + seed, ece=5.0 + seed,
                )
    runs = aggregate.load_runs(root / "exp1")
    assert len(runs) == 8
    grouped = aggregate.group_runs(runs)
    aggregate.print_summary(grouped)
    aggregate.print_average_summary(grouped)
    out = capsys.readouterr().out
    assert "=== Dataset: caltech101 ===" in out
    assert "GP_0shots" in out  # zero-shot row synthesized from 1-shot runs
    assert "Average across datasets (2 datasets)" in out

    aggregate.write_experiment_tables(grouped, "exp1", root)
    avg_csv = (root / "exp1" / "_tables" / "Average.csv").read_text()
    assert "method,acc_1,acc_2,acc_4" in avg_csv
    assert "GP" in avg_csv
    assert (root / "exp1" / "_tables" / "caltech101.csv").exists()

    aggregate.make_plots(grouped, "exp1", root, show_zero_shot=True)
    assert (root / "exp1" / "_plots" / "perf_per_shots" / "caltech101.png").exists()
    assert (root / "exp1" / "_plots" / "perf_per_shots" / "Average.png").exists()
    assert (root / "exp1" / "_plots" / "acc_vs_ece" / "eurosat.png").exists()


def test_aggregate_delete_prunes_unfinished(tmp_path):
    root = tmp_path / "output"
    _write_run(root, "exp1", "caltech101", "GP_1shots", 1, 1, 60.0, 5.0)
    empty = root / "exp1" / "caltech101" / "GP_1shots" / "seed2"
    empty.mkdir(parents=True)
    runs = aggregate.load_runs(root / "exp1", delete=True)
    assert len(runs) == 1
    assert not empty.exists()


def test_reliability_diagrams(tmp_path):
    root = tmp_path / "output"
    payload_bins = {
        "bin_acc": [0.1 * i for i in range(10)],
        "bin_conf": [0.05 + 0.1 * i for i in range(10)],
        "bin_count": [10] * 10,
    }
    d = root / "exp1" / "caltech101" / "GP_1shots" / "seed1"
    d.mkdir(parents=True)
    d.joinpath("metrics.json").write_text(
        json.dumps(
            {
                "dataset": "caltech101", "shots": 1, "seed": 1,
                "method": "gp", "backbone": "RN50",
                "zero_shot": None,
                "metrics": {
                    "top1_acc": 60.0, "ece": 5.0, "aece": 6.0,
                    "calibration": payload_bins,
                },
            }
        )
    )
    runs = aggregate.load_runs(root / "exp1")
    grouped = aggregate.group_runs(runs)
    aggregate.make_reliability_diagrams(grouped, "exp1", root)
    assert (
        root / "exp1" / "_plots" / "reliability"
        / "caltech101__GP_1shots__1shots.png"
    ).exists()


# ----------------------------------------------------------------------
# vmap backend: multi-method grouping, strict flag, fallback counting
# ----------------------------------------------------------------------

def _clip_adapter_sweep_cfg(tmp_path):
    """Tiny CLIP-Adapter sweep on Synthetic: seeds x ratio grid, all
    vmap-groupable."""
    trainer_yaml = tmp_path / "trainer.yaml"
    trainer_yaml.write_text(textwrap.dedent("""\
        name: vmapexp
        BASE_CONFIG: configs/trainers/default.yaml
        TRAINER_NAME: CLIP-Adapter
        MODEL:
          BACKBONE:
            NAME: TEST-ViT
        INPUT:
          SIZE: (32, 32)
        DATALOADER:
          NUM_WORKERS: 2
          TRAIN_X:
            BATCH_SIZE: 8
          TEST:
            BATCH_SIZE: 8
        TRAINER:
          ADAPTER:
            NUM_TEMPLATES: 2
            CLIP_ADAPTER_EPOCHS: 2
            USE_GP: False
    """))
    return {
        "name": "vmapexp",
        "datasets": ["synthetic"],
        "seeds": [1, 2],
        "shots": [2],
        "root": str(tmp_path / "data"),
        "output_root": str(tmp_path / "output"),
        "template": "{experiment}/{dataset}/CA_{shots}shots{sig}/seed{seed}",
        "grid": {"TRAINER.ADAPTER.CLIP_ADAPTER_RATIO": [0.1, 0.5]},
        "dataset_config": "configs/datasets/synthetic.yaml",
        "__config_file__": str(trainer_yaml),
    }


def test_vmap_backend_clip_adapter_no_fallback(tmp_path, capsys, monkeypatch):
    """BASELINE config #3 shape: a non-Adapter head sweep runs fully vmapped
    (zero in-process fallbacks) and writes per-trial metrics.json."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    from clip_gp_tpu.parallel.sweep import run_trials_vmapped

    trials, _ = build_trials(_clip_adapter_sweep_cfg(tmp_path))
    assert len(trials) == 4  # 2 seeds x 2 ratios
    results = run_trials_vmapped(trials, strict=True)
    out = capsys.readouterr().out
    assert "not vmap-groupable" not in out
    assert "[ERROR]" not in out
    assert len(results) == 4
    for t in trials:
        payload = json.loads((t.format_outdir() / "metrics.json").read_text())
        assert payload["metrics"]["top1_acc"] is not None
        assert (t.format_outdir() / "log.txt").exists()


def test_vmap_backend_coop_no_fallback(tmp_path, capsys, monkeypatch):
    """BASELINE config #4 shape: a CoOp seeds x OPTIM.LR sweep runs fully
    vmapped (zero in-process fallbacks) with per-trial metrics.json."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    from clip_gp_tpu.parallel.sweep import run_trials_vmapped

    trainer_yaml = tmp_path / "coop.yaml"
    trainer_yaml.write_text(textwrap.dedent("""\
        name: coopexp
        BASE_CONFIG: configs/trainers/default.yaml
        TRAINER_NAME: Adapter-CoOp
        MODEL:
          BACKBONE:
            NAME: TEST-ViT
        INPUT:
          SIZE: (32, 32)
        DATALOADER:
          NUM_WORKERS: 2
          TRAIN_X:
            BATCH_SIZE: 8
          TEST:
            BATCH_SIZE: 8
        TRAINER:
          ADAPTER:
            NUM_TEMPLATES: 2
            CLIP_ADAPTER_EPOCHS: 2
            N_CTX: 2
            USE_GP: False
    """))
    cfg = {
        "name": "coopexp",
        "datasets": ["synthetic"],
        "seeds": [1, 2],
        "shots": [2],
        "root": str(tmp_path / "data"),
        "output_root": str(tmp_path / "output"),
        "template": "{experiment}/{dataset}/coop_{shots}shots{sig}/seed{seed}",
        "grid": {"OPTIM.LR": [0.002, 0.02]},
        "dataset_config": "configs/datasets/synthetic.yaml",
        "__config_file__": str(trainer_yaml),
    }
    trials, _ = build_trials(cfg)
    assert len(trials) == 4  # 2 seeds x 2 lrs, one vmapped group
    results = run_trials_vmapped(trials, strict=True)
    out = capsys.readouterr().out
    assert "not vmap-groupable" not in out
    assert "[ERROR]" not in out
    assert len(results) == 4
    for t in trials:
        payload = json.loads((t.format_outdir() / "metrics.json").read_text())
        assert payload["metrics"]["top1_acc"] is not None
        assert payload["config"]["optim"]["lr"] in (0.002, 0.02)


def test_strict_vmap_raises_and_fallback_counts(tmp_path, capsys, monkeypatch):
    import clip_gp_tpu.parallel.sweep as sweep_mod
    import clip_gp_tpu.parallel.trial_vmap as tv

    def boom(*a, **k):
        raise RuntimeError("injected vmap failure")

    monkeypatch.setattr(tv, "run_vmapped_trials", boom)
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trials, _ = build_trials(_clip_adapter_sweep_cfg(tmp_path))

    import pytest

    with pytest.raises(RuntimeError, match="strict-vmap"):
        sweep_mod.run_trials_vmapped(trials, strict=True)

    # non-strict: loud fallback counter + trials complete in-process
    ran = []
    monkeypatch.setattr(
        sweep_mod, "run_trials_inprocess", lambda ts: ran.extend(ts) or []
    )
    sweep_mod.run_trials_vmapped(trials, strict=False)
    out = capsys.readouterr().out
    assert "1 group(s) fell back" in out
    assert len(ran) == len(trials)


def test_group_parallel_strict_and_fallback(tmp_path, capsys, monkeypatch):
    """Strict failures propagate out of concurrent workers; non-strict
    failures fall back to in-process for every group."""
    import clip_gp_tpu.parallel.sweep as sweep_mod
    import clip_gp_tpu.parallel.trial_vmap as tv

    def boom(*a, **k):
        raise RuntimeError("injected vmap failure")

    monkeypatch.setattr(tv, "run_vmapped_trials", boom)
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    cfg = _clip_adapter_sweep_cfg(tmp_path)
    cfg["shots"] = [1, 2, 4]  # 3 groups -> 2 workers, one runs 2 items
    trials, _ = build_trials(cfg)

    import pytest

    with pytest.raises(RuntimeError, match="strict-vmap"):
        sweep_mod.run_trials_vmapped(trials, strict=True, group_parallel=2)

    ran = []
    monkeypatch.setattr(
        sweep_mod, "run_trials_inprocess", lambda ts: ran.extend(ts) or []
    )
    sweep_mod.run_trials_vmapped(trials, strict=False, group_parallel=2)
    out = capsys.readouterr().out
    assert "3 group(s) fell back" in out
    assert len(ran) == len(trials)


def test_bars_notebook_analog(tmp_path):
    """reporting.bars: the scripts/test.ipynb analog — runs.csv + per-dataset
    3-metric grouped bar figures from metrics.json runs across experiments."""
    import csv

    from clip_gp_tpu.reporting import bars

    root = tmp_path / "output"
    for exp in ("expA", "expB"):
        for shots in (1, 4):
            for seed in (1, 2):
                _write_run(root, exp, "caltech101", f"GP_{shots}shots", seed,
                           shots, acc=55.0 + shots + seed, ece=6.0 + seed)
    rc = bars.main([
        "expA", "expB", "--output-root", str(root),
        "--outdir", str(root / "plots"),
    ])
    assert rc == 0
    with (root / "runs.csv").open() as f:
        rows = list(csv.DictReader(f))
    # 2 experiments x 1 dataset x 2 shot counts
    assert len(rows) == 4
    assert {r["experiment_name"] for r in rows} == {"expA", "expB"}
    assert float(rows[0]["acc_mean"]) > 0
    assert (root / "plots" / "caltech101_all_metrics.png").exists()


def test_subprocess_launcher_prefix(tmp_path, monkeypatch):
    """--launcher prefixes each trial command with the per-device template
    (the multi-host dispatch hook); verified with a no-op `env` launcher."""
    import clip_gp_tpu.parallel.sweep as sweep_mod

    calls = []

    def fake_call(cmd, env=None, **kwargs):
        calls.append(cmd)
        outdir = cmd[cmd.index("--output-dir") + 1]
        (Path(outdir) / "log.txt").write_text("ok")
        return 0

    monkeypatch.setattr(sweep_mod.subprocess, "call", fake_call)
    trials, _ = build_trials(_clip_adapter_sweep_cfg(tmp_path))
    results = sweep_mod.run_trials_subprocess(
        trials, devices=["hostA", "hostB"], jobs_per_device=1,
        launcher="env CLIP_GP_TPU_HOST={device}",
    )
    assert len(results) == len(trials)
    assert all(r["return_code"] == 0 for r in results)
    prefixes = {tuple(c[:3]) for c in calls}
    assert prefixes <= {
        ("env", "CLIP_GP_TPU_HOST=hostA", str(sweep_mod.sys.executable)),
        ("env", "CLIP_GP_TPU_HOST=hostB", str(sweep_mod.sys.executable)),
    }
    assert len(prefixes) == 2  # round-robined over both hosts


# ----------------------------------------------------------------------
# decode-ahead prefetch (sequential vmap path, round 3)
# ----------------------------------------------------------------------

def _adapter_two_group_cfg(tmp_path, output_root):
    """Two trial groups (shots 1 and 2) of the feature-cached Adapter head —
    the sequential path prefetch-decodes group 2 while group 1 trains."""
    trainer_yaml = tmp_path / "adapter_trainer.yaml"
    if not trainer_yaml.exists():
        trainer_yaml.write_text(textwrap.dedent("""\
            name: pfexp
            BASE_CONFIG: configs/trainers/default.yaml
            TRAINER_NAME: Adapter
            MODEL:
              BACKBONE:
                NAME: TEST-ViT
            INPUT:
              SIZE: (32, 32)
            DATALOADER:
              NUM_WORKERS: 2
              TRAIN_X:
                BATCH_SIZE: 8
              TEST:
                BATCH_SIZE: 8
            TRAINER:
              ADAPTER:
                NUM_TEMPLATES: 2
                CLIP_ADAPTER_EPOCHS: 2
                USE_GP: False
        """))
    return {
        "name": "pfexp",
        "datasets": ["synthetic"],
        "seeds": [1, 2],
        "shots": [1, 2],
        "root": str(tmp_path / "data"),
        "output_root": str(output_root),
        "template": "{experiment}/{dataset}/AD_{shots}shots/seed{seed}",
        "dataset_config": "configs/datasets/synthetic.yaml",
        "__config_file__": str(trainer_yaml),
    }


def _run_and_collect(tmp_path, output_root, monkeypatch, disable: bool,
                     budget_mb=None):
    from clip_gp_tpu.parallel.sweep import run_trials_vmapped
    from clip_gp_tpu.runtime import feature_cache

    if disable:
        monkeypatch.setenv("CLIP_GP_TPU_DISABLE_DECODE_PREFETCH", "1")
    else:
        monkeypatch.delenv("CLIP_GP_TPU_DISABLE_DECODE_PREFETCH",
                           raising=False)
    if budget_mb is not None:
        monkeypatch.setenv("CLIP_GP_TPU_PREFETCH_BUDGET_MB", str(budget_mb))
    else:
        monkeypatch.delenv("CLIP_GP_TPU_PREFETCH_BUDGET_MB", raising=False)
    feature_cache.memo_clear()
    trials, _ = build_trials(_adapter_two_group_cfg(tmp_path, output_root))
    assert len(trials) == 4  # 2 shots-cells x 2 seeds
    results = run_trials_vmapped(trials, strict=True)
    assert len(results) == 4
    out = {}
    for t in trials:
        payload = json.loads((t.format_outdir() / "metrics.json").read_text())
        out[(t.shots, t.seed)] = (payload["metrics"], payload["zero_shot"])
    return out


def test_decode_prefetch_bit_identical_and_fires(tmp_path, capsys,
                                                 monkeypatch):
    """The decode-ahead path must announce itself, produce the same
    metrics.json as the strictly sequential path (bit-identical splits,
    augmentation draws and features), and respect a 1-batch byte budget."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

    seq = _run_and_collect(tmp_path, tmp_path / "out_seq", monkeypatch,
                           disable=True)
    capsys.readouterr()
    pf = _run_and_collect(tmp_path, tmp_path / "out_pf", monkeypatch,
                          disable=False)
    out = capsys.readouterr().out
    assert "decode-ahead: prefetching group 2/2" in out
    assert seq == pf

    # byte budget 0 -> the buffer holds exactly one batch at a time
    # (producer and consumer run in lockstep); results must not change
    tiny = _run_and_collect(tmp_path, tmp_path / "out_tiny", monkeypatch,
                            disable=False, budget_mb=0)
    assert seq == tiny
