"""scripts/predict.py serving CLI: folder prediction from checkpoint
classnames (no dataset needed) and split prediction with accuracy summary.
Capability extension over the reference (its pipeline stops at --eval-only)."""

import importlib
import json
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

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))
predict_cli = importlib.import_module("predict")


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    mp = pytest.MonkeyPatch()
    mp.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    tmp_path = tmp_path_factory.mktemp("predict")
    c = Config()
    c.trainer_name = "Adapter"
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 4
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 2
    c.optim.max_epoch = 2
    c.train.print_freq = 100
    c.output_dir = str(tmp_path / "run")
    c.seed = 1

    set_random_seed(c.seed)
    dm = build_data_manager(c)
    trainer = build_trainer(c, dm)
    trainer.train()
    trainer.save_model(c.optim.max_epoch - 1, c.output_dir)
    save_config_to_file(c, str(Path(c.output_dir) / "config.json"))
    yield c, tmp_path
    mp.undo()


def test_predict_folder(trained_run):
    c, tmp_path = trained_run
    images_dir = Path(c.dataset.root) / "synthetic" / "images"
    out = tmp_path / "preds.json"
    predict_cli.main(
        ["--model-dir", c.output_dir, "--images", str(images_dir),
         "--topk", "3", "--output", str(out)]
    )
    payload = json.loads(out.read_text())
    assert payload["num_classes"] == 4
    assert payload["num_images"] == len(payload["predictions"]) > 0
    p0 = payload["predictions"][0]
    assert len(p0["topk"]) == 3
    probs = [t["prob"] for t in p0["topk"]]
    assert probs == sorted(probs, reverse=True)
    assert 0 < sum(probs) <= 1.0 + 1e-6
    names = {t["classname"] for pr in payload["predictions"] for t in pr["topk"]}
    assert names <= {"red circle", "green square", "blue stripe", "yellow dot"}


def test_predict_split_summary(trained_run):
    c, tmp_path = trained_run
    out = tmp_path / "preds_split.json"
    predict_cli.main(
        ["--model-dir", c.output_dir, "--split", "test", "--output", str(out)]
    )
    payload = json.loads(out.read_text())
    s = payload["summary"]
    assert s["split"] == "test"
    assert 0 <= s["top1_acc"] <= 100
    assert np.isfinite(s["ece"]) and np.isfinite(s["aece"])
    # the training synthetic task is separable: trained adapter beats chance
    assert s["top1_acc"] >= 25.0


def test_predict_requires_one_source(trained_run):
    c, _ = trained_run
    with pytest.raises(SystemExit):
        predict_cli.main(["--model-dir", c.output_dir])
