"""Cross-dataset (class-subset) checkpoint reload — the OOD-eval analog.

BASELINE config #5 evaluates an ImageNet-trained adapter on the OOD variants;
ImageNet-A/R keep only 200 of the 1000 classes, so per-class state must be
row-remapped by classname at load time. The reference's strict
``load_state_dict`` crashes on that shape mismatch (ref: utils/trainer.py:408)
— subset reload is a documented capability extension (COMPONENTS.md). Here the
subset dataset is the Synthetic catalog's ``base`` subsample (first half of
the classes), exercising the same flow without real data.
"""

import json
import os

import numpy as np
import pytest

import clip_gp_tpu.data.datasets  # noqa: F401
import clip_gp_tpu.methods  # noqa: F401
from clip_gp_tpu.core.config import Config
from clip_gp_tpu.core.registry import build_trainer
from clip_gp_tpu.core.seeding import set_random_seed
from clip_gp_tpu.data.pipeline import build_data_manager


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def make_config(tmp_path, trainer_name, out_name, subsample="all", **overrides):
    c = Config()
    c.trainer_name = trainer_name
    c.dataset.name = "Synthetic"
    c.dataset.root = str(tmp_path / "data")
    c.dataset.num_shots = 4
    c.dataset.subsample_classes = subsample
    c.model.backbone_name = "TEST-ViT"
    c.input.size = (32, 32)
    c.dataloader.batch_size_train = 8
    c.dataloader.batch_size_test = 8
    c.dataloader.num_workers = 2
    c.adapter.num_templates = 2
    c.adapter.clip_adapter_epochs = 2
    c.adapter.taskres_epochs = 2
    c.adapter.tip_adapter_epochs = 2
    c.adapter.gp_num_mc_samples_train = 4
    c.adapter.gp_num_mc_samples_eval = 8
    c.adapter.n_ctx = 2
    c.optim.max_epoch = 2
    c.optim.name = "adamw"
    c.optim.lr = 0.01
    c.train.print_freq = 100
    c.output_dir = str(tmp_path / out_name)
    c.seed = 1
    for key, val in overrides.items():
        setattr(c.adapter, key, val)
    return c


def _train_and_save(config):
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.train()
    trainer.save_model(config.optim.max_epoch - 1, config.output_dir)
    return trainer


def _eval_subset(config):
    """Build an eval trainer on the subset dataset and reload + test."""
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.build_model()
    loaded = trainer.load_model(config.model_dir)
    assert loaded > 0
    import time

    trainer.time_start = time.time()
    trainer.test()
    return trainer


def _metrics(outdir):
    with open(os.path.join(outdir, "metrics.json")) as f:
        return json.load(f)


def test_adapter_template_logits_subset_parity(tmp_path):
    cfg = make_config(
        tmp_path, "Adapter", "full", train_template_weights=True
    )
    full = _train_and_save(cfg)
    k_full = np.asarray(full.params["template_logits"]).shape[0]
    assert k_full == 4

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="base",
        train_template_weights=True,
    )
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)

    # per-class rows must be the trained rows for the surviving classnames
    base_names = list(sub.dm.dataset.classnames)
    all_names = list(full.dm.dataset.classnames)
    idx = [all_names.index(c) for c in base_names]
    np.testing.assert_array_equal(
        np.asarray(sub.params["template_logits"]),
        np.asarray(full.params["template_logits"])[idx],
    )
    np.testing.assert_array_equal(
        np.asarray(sub.params["visual_proj"]),
        np.asarray(full.params["visual_proj"]),
    )
    m = _metrics(ecfg.output_dir)
    assert np.isfinite(m["metrics"]["top1_acc"])
    assert len(base_names) == 2


def test_adapter_gp_subset(tmp_path):
    cfg = make_config(tmp_path, "Adapter", "full", use_gp=True, gp_pca_dim=8)
    full = _train_and_save(cfg)

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="base", use_gp=True, gp_pca_dim=8
    )
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)

    base_names = list(sub.dm.dataset.classnames)
    all_names = list(full.dm.dataset.classnames)
    idx = [all_names.index(c) for c in base_names]

    # every per-class GP leaf remapped to K=2, matching the trained rows
    for name in sub._GP_PER_CLASS:
        if name in sub.params["gp"]:
            np.testing.assert_allclose(
                np.asarray(sub.params["gp"][name]),
                np.asarray(full.params["gp"][name])[idx],
            )
    # buffers come from the TRAINING dataset (its PCA basis), row-selected
    np.testing.assert_allclose(
        np.asarray(sub.gp_buffers["templates"]),
        np.asarray(full.gp_buffers["templates"])[idx],
    )
    np.testing.assert_allclose(
        np.asarray(sub.gp_buffers["pca_W"]), np.asarray(full.gp_buffers["pca_W"])
    )
    assert sub.gp_static.num_classes == 2
    m = _metrics(ecfg.output_dir)
    assert np.isfinite(m["metrics"]["ece"])


def test_taskres_subset(tmp_path):
    cfg = make_config(tmp_path, "TaskRes", "full")
    full = _train_and_save(cfg)

    ecfg = make_config(tmp_path, "TaskRes", "sub", subsample="base")
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)

    base_names = list(sub.dm.dataset.classnames)
    all_names = list(full.dm.dataset.classnames)
    idx = [all_names.index(c) for c in base_names]
    np.testing.assert_allclose(
        np.asarray(sub.params["residuals"]),
        np.asarray(full.params["residuals"])[idx],
    )
    assert np.isfinite(_metrics(ecfg.output_dir)["metrics"]["top1_acc"])


def test_clip_adapter_subset(tmp_path):
    cfg = make_config(tmp_path, "CLIP-Adapter", "full")
    full = _train_and_save(cfg)

    ecfg = make_config(tmp_path, "CLIP-Adapter", "sub", subsample="base")
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)

    base_names = list(sub.dm.dataset.classnames)
    all_names = list(full.dm.dataset.classnames)
    idx = [all_names.index(c) for c in base_names]
    np.testing.assert_allclose(
        np.asarray(sub.clip_weights),
        np.asarray(full.clip_weights)[:, idx],
    )
    assert np.isfinite(_metrics(ecfg.output_dir)["metrics"]["top1_acc"])


def test_coop_csc_subset(tmp_path):
    cfg = make_config(tmp_path, "Adapter-CoOp", "full", csc=True)
    full = _train_and_save(cfg)
    assert np.asarray(full.params["ctx"]).ndim == 3

    ecfg = make_config(tmp_path, "Adapter-CoOp", "sub", subsample="base", csc=True)
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)
    assert np.asarray(sub.params["ctx"]).shape[0] == 2
    assert np.isfinite(_metrics(ecfg.output_dir)["metrics"]["top1_acc"])


def test_missing_classes_raise(tmp_path):
    # train on the FIRST half, try to eval on the SECOND half: no overlap
    cfg = make_config(
        tmp_path, "Adapter", "full", subsample="base",
        train_template_weights=True,
    )
    _train_and_save(cfg)

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="new",
        train_template_weights=True,
    )
    set_random_seed(ecfg.seed)
    dm = build_data_manager(ecfg)
    trainer = build_trainer(ecfg, dm)
    trainer.build_model()
    with pytest.raises(ValueError, match="missing"):
        trainer.load_model(cfg.output_dir)


def test_duplicate_trained_classnames_raise(tmp_path):
    # ImageNet-style duplicate names ('crane' twice) make a name-keyed remap
    # ambiguous — the load must refuse rather than pick a row silently
    cfg = make_config(tmp_path, "Adapter", "full", train_template_weights=True)
    _train_and_save(cfg)
    from clip_gp_tpu.runtime.trainer_base import resolve_checkpoint_path

    path = resolve_checkpoint_path(cfg.output_dir)
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    arrays["__classnames__"] = np.asarray(
        ["blue stripe", "green square", "blue stripe", "yellow dot"],
        dtype=np.str_,
    )
    np.savez_compressed(path, **arrays)

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="base",
        train_template_weights=True,
    )
    set_random_seed(ecfg.seed)
    dm = build_data_manager(ecfg)
    trainer = build_trainer(ecfg, dm)
    trainer.build_model()
    with pytest.raises(ValueError, match="more than once"):
        trainer.load_model(cfg.output_dir)


def test_class_keys_remap_beats_duplicate_names(tmp_path):
    """When both sides carry unique class keys (ImageNet wnids), the remap
    uses them and duplicate classnames are harmless."""
    cfg = make_config(tmp_path, "Adapter", "full", train_template_weights=True)
    full = _train_and_save(cfg)
    from clip_gp_tpu.runtime.trainer_base import resolve_checkpoint_path

    path = resolve_checkpoint_path(cfg.output_dir)
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    # names ambiguous (first name duplicated), keys unique
    arrays["__classnames__"] = np.asarray(
        ["blue stripe", "green square", "blue stripe", "yellow dot"],
        dtype=np.str_,
    )
    arrays["__class_keys__"] = np.asarray(
        ["k0", "k1", "k2", "k3"], dtype=np.str_
    )
    np.savez_compressed(path, **arrays)

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="base",
        train_template_weights=True,
    )
    set_random_seed(ecfg.seed)
    dm = build_data_manager(ecfg)
    dm.dataset.class_keys = ["k0", "k1"]  # base = labels 0,1 of the full set
    trainer = build_trainer(ecfg, dm)
    trainer.build_model()
    assert trainer.load_model(cfg.output_dir) > 0
    np.testing.assert_array_equal(
        np.asarray(trainer.params["template_logits"]),
        np.asarray(full.params["template_logits"])[[0, 1]],
    )


def test_gp_subset_without_extra_state_raises(tmp_path):
    """A GP checkpoint whose sibling extra_state.npz was lost cannot be
    remapped (the PCA basis lives there) — must fail with guidance, not
    garbage prototypes."""
    cfg = make_config(tmp_path, "Adapter", "full", use_gp=True, gp_pca_dim=8)
    _train_and_save(cfg)
    import os

    os.remove(os.path.join(cfg.output_dir, "adapter", "extra_state.npz"))

    ecfg = make_config(
        tmp_path, "Adapter", "sub", subsample="base", use_gp=True, gp_pca_dim=8
    )
    set_random_seed(ecfg.seed)
    dm = build_data_manager(ecfg)
    trainer = build_trainer(ecfg, dm)
    trainer.build_model()
    with pytest.raises(ValueError, match="gp_buffers"):
        trainer.load_model(cfg.output_dir)


def test_same_dataset_reload_unchanged(tmp_path):
    # the remap must NOT trigger on a normal same-dataset reload
    cfg = make_config(tmp_path, "Adapter", "full", train_template_weights=True)
    full = _train_and_save(cfg)

    ecfg = make_config(tmp_path, "Adapter", "sub", train_template_weights=True)
    ecfg.eval_only = True
    ecfg.model_dir = cfg.output_dir
    sub = _eval_subset(ecfg)
    np.testing.assert_array_equal(
        np.asarray(sub.params["template_logits"]),
        np.asarray(full.params["template_logits"]),
    )
