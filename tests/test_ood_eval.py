"""scripts/ood_eval.py: one ImageNet-trained run evaluated across the OOD
variants (BASELINE config #5 shape) on the tiny catalog fixtures — including
a class-subset variant that exercises the wnid remap end-to-end."""

import importlib
import json
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401
from clip_gp_tpu.core.config import Config, save_config_to_file
from clip_gp_tpu.core.registry import build_trainer
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.pipeline import build_data_manager

from test_dataset_catalogs import build_imagenet, build_imagenet_a, build_imagenet_r

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))
ood_cli = importlib.import_module("ood_eval")


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _train_imagenet_run(tmp_path, **adapter_overrides):
    build_imagenet(tmp_path)
    c = Config()
    c.trainer_name = "Adapter"
    c.dataset.name = "ImageNet"
    c.dataset.root = str(tmp_path)
    c.dataset.num_shots = 1
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 4
    c.dataloader.batch_size_test = 4
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 2
    c.optim.max_epoch = 2
    c.train.print_freq = 100
    c.output_dir = str(tmp_path / "run")
    c.seed = 1
    for key, val in adapter_overrides.items():
        setattr(c.adapter, key, val)
    set_random_seed(c.seed)
    dm = build_data_manager(c)
    trainer = build_trainer(c, dm)
    trainer.train()
    trainer.save_model(c.optim.max_epoch - 1, c.output_dir)
    save_config_to_file(c, str(Path(c.output_dir) / "config.json"))
    return c


def test_ood_eval_full_and_subset(tmp_path):
    cfg = _train_imagenet_run(tmp_path, train_template_weights=True)
    build_imagenet_a(tmp_path)  # same 2 wnids
    build_imagenet_r(tmp_path)
    # make R a strict class subset (drop the second wnid) → wnid remap path
    shutil.rmtree(tmp_path / "imagenet-rendition" / "imagenet-r" / "n01443537")

    ood_cli.main(
        ["--model-dir", cfg.output_dir, "--root", str(tmp_path),
         "--variants", "ImageNetA,ImageNetR"]
    )
    payload = json.loads((Path(cfg.output_dir) / "ood_metrics.json").read_text())
    assert payload["source_dataset"] == "ImageNet"
    a = payload["variants"]["ImageNetA"]
    r = payload["variants"]["ImageNetR"]
    assert a["num_classes"] == 2 and r["num_classes"] == 1
    for row in (a, r):
        assert "error" not in row
        assert 0 <= row["top1_acc"] <= 100 and np.isfinite(row["ece"])
    # per-variant full metrics.json written under <run>/ood/<variant>/
    for name in ("ImageNetA", "ImageNetR"):
        m = json.loads(
            (Path(cfg.output_dir) / "ood" / name / "metrics.json").read_text()
        )
        assert m["dataset"] == name


def test_ood_eval_gp_subset(tmp_path):
    """GP head: per-class params AND training-dataset buffers remap through
    the runner (the BASELINE #5 flagship shape)."""
    cfg = _train_imagenet_run(tmp_path, use_gp=True, gp_pca_dim=4)
    build_imagenet_a(tmp_path)
    shutil.rmtree(tmp_path / "imagenet-adversarial" / "imagenet-a" / "n01440764")

    ood_cli.main(
        ["--model-dir", cfg.output_dir, "--root", str(tmp_path),
         "--variants", "ImageNetA"]
    )
    payload = json.loads((Path(cfg.output_dir) / "ood_metrics.json").read_text())
    row = payload["variants"]["ImageNetA"]
    assert "error" not in row
    assert row["num_classes"] == 1


def test_ood_eval_missing_variant_data_reported(tmp_path):
    cfg = _train_imagenet_run(tmp_path, train_template_weights=True)
    # ImageNetSketch dir never built → per-variant error, nonzero exit
    with pytest.raises(SystemExit):
        ood_cli.main(
            ["--model-dir", cfg.output_dir, "--root", str(tmp_path),
             "--variants", "ImageNetSketch"]
        )
    payload = json.loads((Path(cfg.output_dir) / "ood_metrics.json").read_text())
    assert "error" in payload["variants"]["ImageNetSketch"]
