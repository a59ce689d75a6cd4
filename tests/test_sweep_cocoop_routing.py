"""Measured single-chip routing for CoCoOp groups in the vmap backend.

BENCH_cocoop_vmap.json (TPU, 2026-08-20): a warm vmapped CoCoOp group is
~parity with T sequential in-process trials (0.96x at T=5, K=50) while its
per-K compiles cost ~5x the whole in-process group cold — the per-step
prompt batch B*K is already MXU-sized in-process, so the trial axis
amortizes nothing on one chip. The sweep therefore routes single-chip
CoCoOp groups to the in-process backend; --trial-mesh (chip-parallel
trials), --strict-vmap, or CLIP_GP_TPU_VMAP_COCOOP=1 selects vmap.
"""

import json

import pytest
import yaml

from clip_gp_tpu.runtime import feature_cache


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _experiment_yaml(tmp_path, output_root, seeds):
    spec = {
        "name": "cocoop_route",
        "BASE_CONFIG": "configs/trainers/default.yaml",
        "root": str(tmp_path / "data"),
        "datasets": ["synthetic"],
        "seeds": seeds,
        "shots": [2],
        "output_root": str(output_root),
        "template": "{experiment}/{dataset}/CoCoOp_{shots}shots{sig}/seed{seed}",
        "grid": {},
        "TRAINER_NAME": "Adapter-CoCoOp",
        "MODEL": {"BACKBONE": {"NAME": "TEST-ViT"}},
        "INPUT": {"SIZE": "(32, 32)"},
        "DATALOADER": {
            "NUM_WORKERS": 2,
            "BATCH_SIZE_TRAIN": 8,
            "BATCH_SIZE_TEST": 8,
        },
        "OPTIM": {"MAX_EPOCH": 2},
        "TRAINER": {
            "ADAPTER": {
                "CLIP_ADAPTER_EPOCHS": 2,
                "N_CTX": 2,
                "NUM_TEMPLATES": 2,
            }
        },
    }
    path = tmp_path / f"{output_root.name}.yaml"
    path.write_text(yaml.safe_dump(spec))
    return path


def _metrics(output_root):
    runs = sorted(output_root.glob("*/*/*/seed*/metrics.json"))
    return [json.loads(p.read_text()) for p in runs]


def test_cocoop_group_routes_inprocess_by_default(tmp_path, capsys):
    from clip_gp_tpu.parallel import sweep as sweep_mod

    out_root = tmp_path / "out_default"
    cfg_path = _experiment_yaml(tmp_path, out_root, seeds=[1, 2])
    feature_cache.memo_clear()
    sweep_mod.main(["--config-file", str(cfg_path), "--backend", "vmap"])
    out = capsys.readouterr().out
    assert "Adapter-CoCoOp routes to the in-process backend" in out
    assert "[vmap] OK method=Adapter-CoCoOp" not in out
    payloads = _metrics(out_root)
    assert len(payloads) == 2
    for p in payloads:
        assert p["metrics"]["top1_acc"] == p["metrics"]["top1_acc"]


def test_cocoop_group_vmaps_under_strict(tmp_path, capsys):
    """--strict-vmap (explicit vmap demand) keeps the vmapped path; the
    routing message must not appear."""
    from clip_gp_tpu.parallel import sweep as sweep_mod

    out_root = tmp_path / "out_strict"
    cfg_path = _experiment_yaml(tmp_path, out_root, seeds=[1, 2])
    feature_cache.memo_clear()
    sweep_mod.main([
        "--config-file", str(cfg_path), "--backend", "vmap", "--strict-vmap",
    ])
    out = capsys.readouterr().out
    assert "routes to the in-process backend" not in out
    assert "[vmap] OK method=Adapter-CoCoOp" in out
    assert len(_metrics(out_root)) == 2


def test_cocoop_group_vmaps_under_trial_mesh(tmp_path, capsys):
    """--trial-mesh keeps the vmapped path: with trials sharded over chips
    the trial axis buys real parallelism (the one regime the measurement
    favors vmap in)."""
    from clip_gp_tpu.parallel import sweep as sweep_mod

    out_root = tmp_path / "out_mesh"
    cfg_path = _experiment_yaml(tmp_path, out_root, seeds=[1, 2])
    feature_cache.memo_clear()
    sweep_mod.main([
        "--config-file", str(cfg_path), "--backend", "vmap", "--trial-mesh",
    ])
    out = capsys.readouterr().out
    assert "routes to the in-process backend" not in out
    assert "shards 2 trial(s) over 2 device(s)" in out
    assert "[vmap] OK method=Adapter-CoCoOp" in out


def test_cocoop_group_vmaps_on_env_optin(tmp_path, capsys, monkeypatch):
    from clip_gp_tpu.parallel import sweep as sweep_mod

    monkeypatch.setenv("CLIP_GP_TPU_VMAP_COCOOP", "1")
    out_root = tmp_path / "out_env"
    cfg_path = _experiment_yaml(tmp_path, out_root, seeds=[1, 2])
    feature_cache.memo_clear()
    sweep_mod.main(["--config-file", str(cfg_path), "--backend", "vmap"])
    out = capsys.readouterr().out
    assert "routes to the in-process backend" not in out
    assert "[vmap] OK method=Adapter-CoCoOp" in out


def test_cocoop_group_vmaps_under_parallel_schedule(tmp_path, capsys):
    """A parallel schedule (multi-device default with >1 dataset bucket)
    keeps CoCoOp vmapped: in-process trials are global-RNG sequential, so
    routing would demote the groups out of their device workers (up to
    n_devices x wall-clock). Measured warm vmap ~= in-process, so staying
    vmapped costs ~nothing and keeps the chips."""
    from test_dataset_catalogs import build_caltech101

    from clip_gp_tpu.parallel import sweep as sweep_mod

    root = tmp_path / "data"
    build_caltech101(root)
    out_root = tmp_path / "out_par"
    spec = yaml.safe_load(
        _experiment_yaml(tmp_path, out_root, seeds=[1, 2]).read_text()
    )
    spec["root"] = str(root)
    spec["datasets"] = ["synthetic", "caltech101"]
    cfg_path = tmp_path / "par.yaml"
    cfg_path.write_text(yaml.safe_dump(spec))
    feature_cache.memo_clear()
    sweep_mod.main(["--config-file", str(cfg_path), "--backend", "vmap"])
    out = capsys.readouterr().out
    assert "routes to the in-process backend" not in out
    assert out.count("[vmap] OK method=Adapter-CoCoOp") == 4
    assert len(_metrics(out_root)) == 4


def test_trial_mesh_rejects_non_integer(tmp_path, capsys):
    from clip_gp_tpu.parallel import sweep as sweep_mod

    cfg_path = _experiment_yaml(tmp_path, tmp_path / "out_bad", seeds=[1])
    with pytest.raises(SystemExit):
        sweep_mod.main([
            "--config-file", str(cfg_path), "--backend", "vmap",
            "--trial-mesh", "all",
        ])
    err = capsys.readouterr().err
    assert "expects an integer or 'auto'" in err
