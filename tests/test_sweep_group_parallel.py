"""Group-parallel vmap sweep: concurrent per-device workers must produce
exactly the metrics of the sequential backend (dataset-sticky placement,
global-RNG split sampling serialized by trial_vmap._SPLIT_RNG_LOCK)."""

import json
from pathlib import Path

import pytest
import yaml

from clip_gp_tpu.core.config import Config, merge_config_from_file
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.pipeline import build_data_manager
from clip_gp_tpu.parallel.sweep import (
    DATASET_NAME_MAP,
    build_trials,
    run_trials_vmapped,
)
from clip_gp_tpu.runtime import feature_cache
import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401

from test_dataset_catalogs import build_caltech101


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _experiment_yaml(tmp_path, root, output_root, datasets, shots):
    spec = {
        "name": "gp_par",
        "BASE_CONFIG": "configs/trainers/default.yaml",
        "root": str(root),
        "datasets": datasets,
        "seeds": [1, 2],
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


def _build(tmp_path, root, output_root, datasets, shots):
    cfg_path = _experiment_yaml(tmp_path, root, output_root, datasets, shots)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["__config_file__"] = str(cfg_path)
    trials, _ = build_trials(cfg)
    return trials


@pytest.mark.parametrize(
    "datasets,shots",
    [
        (["synthetic", "caltech101"], [1]),  # dataset-sticky, 2 devices
        (["synthetic"], [1, 2]),  # pipelined: (dataset, shots) buckets
    ],
    ids=["two-datasets", "pipelined-one-dataset"],
)
def test_group_parallel_matches_sequential(tmp_path, datasets, shots):
    root = tmp_path / "data"
    root.mkdir()
    build_caltech101(root)

    par_trials = _build(tmp_path, root, tmp_path / "out_par", datasets, shots)
    seq_trials = _build(tmp_path, root, tmp_path / "out_seq", datasets, shots)
    assert len(par_trials) == len(seq_trials) == 4  # 2x2

    # pre-generate every few-shot pickle cache: generating vs loading them
    # consumes different amounts of the seeded global RNG stream, and the two
    # runs must see identical augmentation draws
    for t in par_trials:
        cfg = Config()
        merge_config_from_file(cfg, t.dataset_cfg)
        merge_config_from_file(cfg, t.config_file)
        cfg.dataset.num_shots = t.shots
        cfg.dataset.name = DATASET_NAME_MAP[t.dataset]
        cfg.dataset.root = str(root)
        cfg.seed = t.seed
        set_random_seed(t.seed)
        build_data_manager(cfg)

    feature_cache.memo_clear()
    par_results = run_trials_vmapped(par_trials, strict=True, group_parallel=2)
    feature_cache.memo_clear()
    seq_results = run_trials_vmapped(seq_trials, strict=True, group_parallel=1)

    assert len(par_results) == len(seq_results) == 4
    assert all(r["return_code"] == 0 for r in par_results + seq_results)

    for pr, sr in zip(
        sorted(par_results, key=lambda r: r["index"]),
        sorted(seq_results, key=lambda r: r["index"]),
    ):
        assert (pr["dataset"], pr["seed"]) == (sr["dataset"], sr["seed"])
        pm = json.loads((Path(pr["out_dir"]) / "metrics.json").read_text())
        sm = json.loads((Path(sr["out_dir"]) / "metrics.json").read_text())
        assert pm["metrics"]["top1_acc"] == sm["metrics"]["top1_acc"]
        assert pm["metrics"]["ece"] == sm["metrics"]["ece"]
        assert pm["metrics"]["aece"] == sm["metrics"]["aece"]
        # skip-if-done contract holds for concurrently-run groups
        assert (Path(pr["out_dir"]) / "log.txt").exists()
