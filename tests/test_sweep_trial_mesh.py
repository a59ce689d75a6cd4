"""--trial-mesh: each vmapped trial group's [T, ...] state shards over a
device mesh (pure placement — no collectives), and results are identical to
the unsharded run. TPU analog of the reference's --devices trial scheduling
(ref: utils/hparam_search.py:201-281)."""

import json
from pathlib import Path

import pytest
import yaml

from clip_gp_tpu.parallel.sweep import (
    _group_trial_mesh,
    build_trials,
    run_trials_vmapped,
)
from clip_gp_tpu.runtime import feature_cache
import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _experiment_yaml(tmp_path, output_root, seeds, shots):
    spec = {
        "name": "mesh_sweep",
        "BASE_CONFIG": "configs/trainers/default.yaml",
        "root": str(tmp_path / "data"),
        "datasets": ["synthetic"],
        "seeds": seeds,
        "shots": shots,
        "output_root": str(output_root),
        "template": "{experiment}/{dataset}/GP_{shots}shots{sig}/seed{seed}",
        "grid": {},
        "TRAINER_NAME": "Adapter",
        "MODEL": {"BACKBONE": {"NAME": "TEST-ViT"}},
        "INPUT": {"SIZE": "(32, 32)"},
        "DATALOADER": {"NUM_WORKERS": 2},
        "OPTIM": {"MAX_EPOCH": 3},
        "TRAINER": {
            "ADAPTER": {
                "USE_GP": True,
                "CLIP_ADAPTER_EPOCHS": 3,
                "NUM_TEMPLATES": 2,
                "GP_PCA_DIM": 8,
                "GP_NUM_MC_SAMPLES_TRAIN": 4,
                "GP_NUM_MC_SAMPLES_EVAL": 8,
            }
        },
    }
    path = tmp_path / f"{output_root.name}.yaml"
    path.write_text(yaml.safe_dump(spec))
    return path


def _build(tmp_path, output_root, seeds=(1, 2, 3, 4), shots=(1,)):
    cfg_path = _experiment_yaml(tmp_path, output_root, list(seeds), list(shots))
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["__config_file__"] = str(cfg_path)
    trials, _ = build_trials(cfg)
    return trials


def test_group_trial_mesh_divisor_selection():
    import jax

    devices = jax.devices()
    # largest divisor of T that fits the budget
    assert _group_trial_mesh(4, devices, 8).devices.size == 4
    assert _group_trial_mesh(6, devices, 8).devices.size == 6
    assert _group_trial_mesh(6, devices, 4).devices.size == 3
    assert _group_trial_mesh(8, devices, 1 << 30).devices.size == 8
    # prime group larger than the budget -> no even shard -> unsharded
    assert _group_trial_mesh(5, devices, 4) is None
    assert _group_trial_mesh(1, devices, 8) is None


def test_trial_mesh_group_parallel_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_trials_vmapped([], group_parallel=2, trial_mesh=8)


def test_trial_mesh_matches_unsharded(tmp_path, capsys):
    """Two 4-seed groups (shots 1 and 2) sharded over 4 of the virtual 8
    devices: same top-1 accuracy (exact) as the unsharded run; calibration
    metrics agree to float tolerance (XLA tiles the [T/m, ...] shard
    program differently from the [T, ...] one, so reduction order differs
    at ULP level — same caveat as batch-sharded extraction, sweep.py).
    Two groups also engage decode-ahead, covering the
    DecodePrefetcher(mesh=...) forwarding path."""
    mesh_trials = _build(tmp_path, tmp_path / "out_mesh", shots=(1, 2))
    seq_trials = _build(tmp_path, tmp_path / "out_seq", shots=(1, 2))
    assert len(mesh_trials) == len(seq_trials) == 8

    feature_cache.memo_clear()
    mesh_results = run_trials_vmapped(
        mesh_trials, strict=True, trial_mesh=1 << 30
    )
    out = capsys.readouterr().out
    assert out.count("shards 4 trial(s) over 4 device(s)") == 2
    assert "decode-ahead: prefetching group 2/2" in out
    feature_cache.memo_clear()
    seq_results = run_trials_vmapped(seq_trials, strict=True)

    assert len(mesh_results) == len(seq_results) == 8
    assert all(r["return_code"] == 0 for r in mesh_results + seq_results)
    for mr, sr in zip(
        sorted(mesh_results, key=lambda r: r["index"]),
        sorted(seq_results, key=lambda r: r["index"]),
    ):
        assert (mr["seed"], mr["shots"]) == (sr["seed"], sr["shots"])
        mm = json.loads((Path(mr["out_dir"]) / "metrics.json").read_text())
        sm = json.loads((Path(sr["out_dir"]) / "metrics.json").read_text())
        assert mm["metrics"]["top1_acc"] == sm["metrics"]["top1_acc"]
        assert mm["metrics"]["ece"] == pytest.approx(
            sm["metrics"]["ece"], rel=1e-4, abs=1e-6
        )
        assert mm["metrics"]["aece"] == pytest.approx(
            sm["metrics"]["aece"], rel=1e-4, abs=1e-6
        )
        assert (Path(mr["out_dir"]) / "log.txt").exists()


def test_trial_mesh_cli_flag(tmp_path, capsys):
    """python -m clip_gp_tpu.parallel.sweep --backend vmap --trial-mesh:
    one-command multi-device sweep (group of 2 shards over 2 devices)."""
    from clip_gp_tpu.parallel import sweep as sweep_mod

    cfg_path = _experiment_yaml(
        tmp_path, tmp_path / "out_cli", seeds=[1, 2], shots=[1]
    )
    feature_cache.memo_clear()
    sweep_mod.main([
        "--config-file", str(cfg_path), "--backend", "vmap",
        "--strict-vmap", "--trial-mesh",
    ])
    out = capsys.readouterr().out
    assert "shards 2 trial(s) over 2 device(s)" in out
    assert "Experiment complete" in out
    runs = sorted((tmp_path / "out_cli").glob("*/*/*/seed*/metrics.json"))
    assert len(runs) == 2
    for p in runs:
        payload = json.loads(p.read_text())
        assert payload["metrics"]["top1_acc"] == payload["metrics"]["top1_acc"]


def test_trial_mesh_requires_vmap_backend(tmp_path):
    from clip_gp_tpu.parallel import sweep as sweep_mod

    cfg_path = _experiment_yaml(
        tmp_path, tmp_path / "out_err", seeds=[1], shots=[1]
    )
    with pytest.raises(SystemExit):
        sweep_mod.main([
            "--config-file", str(cfg_path), "--backend", "inprocess",
            "--trial-mesh",
        ])
