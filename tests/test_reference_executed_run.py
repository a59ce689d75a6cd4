"""Capstone executed-reference golden: the reference's WHOLE training
pipeline vs our CLI, end to end.

Every stage already has its own executed golden (datasets, transforms, data
manager, trainer math, metrics, config). This test runs the integration:
the reference's actual ``SimpleDataManager`` + ``Trainer("Adapter").train()``
(ref: utils/trainer.py:243-699, trainers/adapter.py:582-699) on a fixture
tree with the tiny torch CLIP, writing its real ``metrics.json`` — then runs
OUR CLI (``train.main``) on an identical tree with the SAME weights
(converted tiny-CLIP state_dict via ``MODEL.INIT_WEIGHTS``) and requires the
metrics.json files to agree.

Determinism setup: all fixture images are exactly INPUT.SIZE so
``transforms=["normalize"]`` consumes no augmentation RNG (the RNG streams
are the one designed divergence, torch vs python); few-shot sampling is
python-``random`` seeded on both sides; everything downstream is
order-invariant math, so the two float32 stacks track to ~1e-3.
"""

from __future__ import annotations

import importlib
import io
import json
import math
from pathlib import Path

import numpy as np
import pytest

from _reference_harness import build_tiny_torch_clip, reference_env

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

SEED = 1
SHOTS = 2
EPOCHS = 8
TEMPLATES = 2
SIZE = 32


def _make_fixture(root):
    """OxfordPets fixture tree with exact-SIZE gradient+noise JPEGs
    (deterministic per path, identical across both roots)."""
    from PIL import Image

    from test_dataset_catalogs import build_oxford_pets

    build_oxford_pets(root)
    for i, p in enumerate(sorted(Path(root).rglob("*.jpg"))):
        rng = np.random.default_rng(1000 + i)
        yy, xx = np.mgrid[0:SIZE, 0:SIZE]
        base = np.stack(
            [xx * 255 / (SIZE - 1), yy * 255 / (SIZE - 1),
             (xx + yy) * 255 / (2 * SIZE - 2)],
            axis=-1,
        )
        arr = np.clip(base + rng.normal(0, 30, (SIZE, SIZE, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(p, format="JPEG",
                                                   quality=92)


def _run_reference(ref_root, ref_out):
    import random as pyrandom

    import torch

    with reference_env(trainer_modules=("adapter",),
                       functional_transforms=True) as env:
        importlib.import_module("datasets.oxford_pets")
        dmmod = importlib.import_module("utils.data_manager")

        tiny = build_tiny_torch_clip(env, seed=0)
        sd = {k: v.detach().numpy() for k, v in tiny.state_dict().items()}
        env.trainer.load_clip = lambda config, device: tiny
        env.adapter.load_clip = lambda config, device: tiny

        cfg = env.config.Config()
        cfg.trainer_name = "Adapter"
        cfg.dataset.name = "OxfordPets"
        cfg.dataset.root = str(ref_root)
        cfg.dataset.num_shots = SHOTS
        cfg.model.backbone_name = "TEST-ViT"
        cfg.input.size = (SIZE, SIZE)
        cfg.input.transforms = ["normalize"]
        cfg.dataloader.batch_size_train = 32
        cfg.dataloader.batch_size_test = 32
        cfg.dataloader.num_workers = 0
        cfg.adapter.num_templates = TEMPLATES
        cfg.adapter.clip_adapter_epochs = EPOCHS
        # default True on both sides; cuda is unavailable so the reference
        # still lands on cpu (utils/trainer.py:249-252)
        cfg.use_cuda = True
        cfg.seed = SEED
        cfg.output_dir = str(ref_out)
        Path(ref_out).mkdir(parents=True, exist_ok=True)

        pyrandom.seed(SEED)
        np.random.seed(SEED)
        torch.manual_seed(SEED)
        dm = dmmod.SimpleDataManager(cfg)
        trainer = env.adapter.Trainer(cfg, dm)
        trainer.train()

    with (Path(ref_out) / "metrics.json").open() as f:
        return json.load(f), sd


def _run_ours(our_root, our_out, sd, tmp_path, monkeypatch):
    from clip_gp_tpu.models.clip_loader import (
        convert_torch_state_dict,
        save_params_npz,
    )
    import train as our_train

    arch, params = convert_torch_state_dict(sd)
    weights = tmp_path / "tiny_clip.npz"
    save_params_npz(str(weights), arch, params)

    monkeypatch.delenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", raising=False)
    our_train.main([
        "--dataset", "OxfordPets",
        "--root", str(our_root),
        "--shots", str(SHOTS),
        "--backbone", "TEST-ViT",
        "--seed", str(SEED),
        "--output-dir", str(our_out),
        "--batch-size", "32",
        "--num-templates", str(TEMPLATES),
        # NOT --transforms: its nargs="+" would swallow the OPTS remainder
        # (faithful to the reference's argparse, same footgun)
        "INPUT.TRANSFORMS", "[normalize]",
        "INPUT.SIZE", f"({SIZE}, {SIZE})",
        "TRAINER.ADAPTER.CLIP_ADAPTER_EPOCHS", str(EPOCHS),
        "DATALOADER.NUM_WORKERS", "0",
        "MODEL.INIT_WEIGHTS", str(weights),
    ])
    with (Path(our_out) / "metrics.json").open() as f:
        return json.load(f)


def _assert_block_close(ours, ref, what, atol, extra_ok=()):
    assert set(ref.keys()) <= set(ours.keys()), what
    assert set(ours.keys()) - set(ref.keys()) == set(extra_ok), what
    for key in ref:
        if key in ("calibration", "adaptive_calibration"):
            continue
        assert math.isclose(ours[key], ref[key], abs_tol=atol), (
            f"{what}.{key}: ours={ours[key]} ref={ref[key]}"
        )
    for cal in ("calibration", "adaptive_calibration"):
        assert ours[cal]["bin_count"] == ref[cal]["bin_count"], f"{what}.{cal}"
        np.testing.assert_allclose(
            ours[cal]["bin_acc"], ref[cal]["bin_acc"], atol=atol,
            err_msg=f"{what}.{cal}.bin_acc",
        )
        np.testing.assert_allclose(
            ours[cal]["bin_conf"], ref[cal]["bin_conf"], atol=atol,
            err_msg=f"{what}.{cal}.bin_conf",
        )


def test_full_pipeline_matches_executed_reference(tmp_path, monkeypatch, capsys):
    ref_root, our_root = tmp_path / "ref_data", tmp_path / "our_data"
    _make_fixture(ref_root)
    _make_fixture(our_root)

    ref_metrics, sd = _run_reference(ref_root, tmp_path / "ref_run")
    our_metrics = _run_ours(our_root, tmp_path / "our_run", sd, tmp_path,
                            monkeypatch)
    capsys.readouterr()

    # identity fields + full schema
    assert our_metrics.keys() == ref_metrics.keys()
    for key in ("dataset", "shots", "seed", "method", "backbone"):
        assert our_metrics[key] == ref_metrics[key], key

    # zero-shot block: frozen towers only — float32 tower noise
    _assert_block_close(our_metrics["zero_shot"], ref_metrics["zero_shot"],
                        "zero_shot", atol=5e-3)
    # final metrics after EPOCHS of training: small compounded drift allowed,
    # but accuracy on the 4-image test set is quantized to 25pp steps.
    # The reference's metrics block spells accuracy "accuracy" (test()) while
    # its zero_shot block spells it "top1_acc" (_compute_final_metrics); we
    # write the superset (documented, aggregator reads either).
    assert our_metrics["metrics"]["accuracy"] == ref_metrics["metrics"]["accuracy"]
    assert our_metrics["metrics"]["top1_acc"] == our_metrics["metrics"]["accuracy"]
    _assert_block_close(our_metrics["metrics"], ref_metrics["metrics"],
                        "metrics", atol=2e-2, extra_ok=("top1_acc",))

    # config dump: every reference-dumped field must exist in ours with the
    # same value (modulo run-local paths); our extras are the documented
    # typed superset (COMPONENTS.md: OPTIM scheduler knobs, gp_jitter, ...)
    PATH_FIELDS = {"dataset.root", "output_dir", "model.init_weights"}
    ALLOWED_EXTRAS = {
        "final_model", "no_test", "dataset.full_finetune",
        "model.int8_inference", "adapter.gp_jitter", "adapter.gp_prior_temp",
        "adapter.prefit_on_full_set", "optim.end_factor", "optim.eta_min",
        "optim.gamma", "optim.milestones", "optim.start_factor",
        "optim.step_size", "optim.total_iters",
    }

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = prefix + k
            if isinstance(v, dict):
                out.update(flatten(v, key + "."))
            else:
                out[key] = v
        return out

    ours_flat = flatten(our_metrics["config"])
    ref_flat = flatten(ref_metrics["config"])
    extras = set(ours_flat) - set(ref_flat)
    assert extras == ALLOWED_EXTRAS, extras ^ ALLOWED_EXTRAS
    assert set(ref_flat) <= set(ours_flat)
    for key, ref_val in ref_flat.items():
        if key in PATH_FIELDS:
            continue
        assert ours_flat[key] == ref_val, (key, ours_flat[key], ref_val)
