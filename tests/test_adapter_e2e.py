"""End-to-end Adapter training (baseline + GP) on the synthetic dataset with a
tiny random-weight CLIP: exercises data → towers → feature cache → train loop
→ MC eval → metrics.json."""

import json
import os

import numpy as np
import pytest

from clip_gp_tpu.core.config import Config
from clip_gp_tpu.core.registry import build_trainer
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.pipeline import build_data_manager
import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401


def make_config(tmp_path, **adapter_overrides):
    c = Config()
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 4
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 3
    c.adapter.gp_num_mc_samples_train = 4
    c.adapter.gp_num_mc_samples_eval = 8
    c.optim.max_epoch = 3
    c.optim.name = "adamw"
    c.optim.lr = 0.01
    c.train.print_freq = 100  # quiet
    c.output_dir = str(tmp_path / "out")
    c.seed = 1
    for k, v in adapter_overrides.items():
        setattr(c.adapter, k, v)
    return c


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _run(config):
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.train()
    return trainer


def _check_metrics_json(output_dir, method):
    path = os.path.join(output_dir, "metrics.json")
    assert os.path.exists(path)
    with open(path) as f:
        payload = json.load(f)
    assert set(payload) >= {
        "timestamp", "dataset", "shots", "seed", "method", "backbone",
        "zero_shot", "metrics", "config", "output_dir", "train_time_s",
    }
    assert payload["method"] == method
    assert payload["dataset"] == "Synthetic"
    m = payload["metrics"]
    assert np.isfinite(m["accuracy"])
    assert 0 <= m["accuracy"] <= 100
    assert 0 <= m["ece"] <= 100
    assert payload["zero_shot"] is not None
    assert len(m["calibration"]["bin_acc"]) == 10
    return payload


def test_adapter_baseline_e2e(tmp_path):
    config = make_config(tmp_path)
    trainer = _run(config)
    payload = _check_metrics_json(config.output_dir, "baseline")
    assert payload["config"]["adapter"]["use_gp"] is False
    # template logits were warm-started and trained
    assert "template_logits" in trainer.params


def test_adapter_gp_e2e(tmp_path):
    config = make_config(tmp_path, use_gp=True, gp_kernel_type="rbf", gp_pca_dim=8)
    trainer = _run(config)
    payload = _check_metrics_json(config.output_dir, "gp")
    assert "gp" in trainer.params
    # GP variational mean moved away from warm start during training
    vm = np.asarray(trainer.params["gp"]["variational_mean"])
    assert np.isfinite(vm).all()


def test_adapter_linear_tw_e2e(tmp_path):
    config = make_config(
        tmp_path, train_template_weights=False, use_linear_template_weighting=True
    )
    trainer = _run(config)
    _check_metrics_json(config.output_dir, "baseline")
    assert "template_weight_linear" in trainer.params


def test_checkpoint_roundtrip(tmp_path):
    config = make_config(tmp_path)
    config.train.enable_adapter_checkpoints = True
    trainer = _run(config)
    ckpt_dir = os.path.join(config.output_dir, "adapter")
    assert any(f.startswith("model.ckpt-") for f in os.listdir(ckpt_dir))
    before = np.asarray(trainer.params["visual_proj"]).copy()
    trainer.params["visual_proj"] = trainer.params["visual_proj"] * 0
    loaded_epoch = trainer.load_model(config.output_dir)
    assert loaded_epoch == 3
    np.testing.assert_allclose(
        np.asarray(trainer.params["visual_proj"]), before, atol=1e-7
    )


def test_run_reproducibility_and_rng_stream_parity(tmp_path, monkeypatch):
    """Two invariants:
    1. same config + seed + mode → bit-identical trained params;
    2. quiet-scan and forced-eager modes consume the training RNG stream
       identically (logging/dispatch mode must not desync randomness).
       Eagerness is forced via CLIP_GP_TPU_FORCE_EAGER_EPOCHS — a TB-based
       eager leg silently scans on hosts without tensorboardX, making the
       cross-mode comparison vacuous.

    Exact-params equality ACROSS modes is not required: scanned vs unrolled
    epochs are different XLA executables and sparsemax support flips make the
    trajectory chaotic under 1e-7-level float reassociation.
    """
    import jax

    def run(root, eager):
        if eager:
            monkeypatch.setenv("CLIP_GP_TPU_FORCE_EAGER_EPOCHS", "1")
        else:
            monkeypatch.delenv("CLIP_GP_TPU_FORCE_EAGER_EPOCHS",
                               raising=False)
        config = make_config(root, use_gp=True, gp_pca_dim=8)
        return _run(config)

    t1 = run(tmp_path / "a", False)
    t2 = run(tmp_path / "b", False)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t3 = run(tmp_path / "c", True)
    # identical RNG-stream positions after training regardless of mode
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(t1.keys._key)),
        np.asarray(jax.random.key_data(t3.keys._key)),
    )


def test_finetune_on_test_sanity_mode(tmp_path, capfd):
    """--finetune-on-test: the cheating ceiling diagnostic optimizes only the
    weighting head on mini-batches of the once-shuffled test set, printing
    loss + test accuracy after EVERY epoch (ref: trainers/adapter.py:
    968-1065; loop shape at :1026-1065)."""
    config = make_config(tmp_path)
    config.adapter.finetune_on_test = True
    _run(config)
    out = capfd.readouterr().out
    assert "[SANITY] Template weights fine-tuning on TEST set" in out
    for ep in (1, 50, 100):
        assert f"[SANITY] Template weights test fine-tune epoch {ep}/100" in out
    # the uniform baseline is promoted to a trainable head, so the sanity
    # accuracy must actually move the loss (a frozen no-op would print a
    # constant) — compare first vs last epoch loss
    import re

    losses = [
        float(m.group(1))
        for m in re.finditer(
            r"test fine-tune epoch \d+/100: loss=([0-9.]+)", out
        )
    ]
    assert len(losses) == 100
    assert losses[-1] < losses[0]
