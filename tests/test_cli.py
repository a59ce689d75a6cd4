"""train.py CLI end-to-end: full run, resumable artifacts, eval-only reload."""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import train as train_cli  # noqa: E402
from clip_gp_tpu.core.logging import reset_tee  # noqa: E402


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    yield
    reset_tee()


def _base_argv(tmp_path, outdir):
    return [
        "--dataset", "Synthetic",
        "--root", str(tmp_path / "data"),
        "--shots", "2",
        "--backbone", "TEST-ViT",
        "--seed", "1",
        "--output-dir", str(outdir),
        "--batch-size", "8",
        "--num-templates", "2",
        "INPUT.SIZE", "(32, 32)",
        "TRAINER.ADAPTER.CLIP_ADAPTER_EPOCHS", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "TRAIN.PRINT_FREQ", "1000",
        "TRAIN.ENABLE_ADAPTER_CHECKPOINTS", "True",
    ]


def test_cli_train_and_eval_only(tmp_path):
    outdir = tmp_path / "run1"
    train_cli.main(_base_argv(tmp_path, outdir))
    reset_tee()
    assert (outdir / "metrics.json").exists()
    assert (outdir / "log.txt").exists()
    assert (outdir / "config.json").exists()
    ckpts = list((outdir / "adapter").glob("model.ckpt-*.npz"))
    assert ckpts, "expected adapter checkpoints"
    with (outdir / "metrics.json").open() as f:
        first = json.load(f)

    # eval-only reload from the trained checkpoint (flags must precede the
    # OPTS remainder, like the reference CLI)
    outdir2 = tmp_path / "run2"
    argv = (
        ["--eval-only", "--model-dir", str(outdir)]
        + _base_argv(tmp_path, outdir2)
    )
    train_cli.main(argv)
    reset_tee()
    with (outdir2 / "metrics.json").open() as f:
        second = json.load(f)
    # same trained weights + same data -> same accuracy
    assert second["metrics"]["accuracy"] == pytest.approx(
        first["metrics"]["accuracy"], abs=1e-6
    )


def test_cli_no_train(tmp_path):
    outdir = tmp_path / "run3"
    train_cli.main(["--no-train"] + _base_argv(tmp_path, outdir))
    reset_tee()
    assert not (outdir / "metrics.json").exists()
    assert (outdir / "config.json").exists()


def test_feature_cache_roundtrip(tmp_path, monkeypatch):
    """Second run with CLIP_GP_TPU_FEATURE_CACHE hits the disk cache for the
    test split and reproduces identical metrics."""
    monkeypatch.setenv("CLIP_GP_TPU_FEATURE_CACHE", str(tmp_path / "fcache"))
    out1 = tmp_path / "fc1"
    train_cli.main(_base_argv(tmp_path, out1))
    reset_tee()
    cache_files = list((tmp_path / "fcache").glob("*.npz"))
    assert cache_files, "expected cached feature files"
    out2 = tmp_path / "fc2"
    train_cli.main(_base_argv(tmp_path, out2))
    reset_tee()
    m1 = json.loads((out1 / "metrics.json").read_text())
    m2 = json.loads((out2 / "metrics.json").read_text())
    assert m2["metrics"]["accuracy"] == pytest.approx(
        m1["metrics"]["accuracy"], abs=1e-6
    )
