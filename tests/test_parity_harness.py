"""Parity harness end-to-end with random weights: the full pipeline runs,
metrics.json is produced with the reference schema, and the ±0.3pp diff
logic passes/fails correctly. Only the real checkpoint file is missing in
this environment (zero egress)."""

import json

import pytest

from tests.test_dataset_catalogs import build_caltech101


@pytest.fixture(autouse=True)
def _random_weights_env(monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")


def _run_config1(tmp_path, reference_root=None, tolerance=None):
    import scripts.parity_check as pc

    argv = [
        "--config", "1",
        "--root", str(tmp_path),
        "--output-root", str(tmp_path / "parity_out"),
        "--backbone-override", "TEST-ViT",
    ]
    if reference_root is not None:
        argv += ["--reference-root", str(reference_root)]
    if tolerance is not None:
        argv += ["--tolerance", str(tolerance)]
    argv += [
        "INPUT.SIZE", "(32, 32)",
        "TRAINER.ADAPTER.CLIP_ADAPTER_EPOCHS", "2",
        "TRAINER.ADAPTER.NUM_TEMPLATES", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "DATALOADER.BATCH_SIZE_TRAIN", "4",
        "DATALOADER.BATCH_SIZE_TEST", "4",
    ]
    return pc.main(argv)


def test_parity_run_and_diff(tmp_path, capfd):
    build_caltech101(tmp_path)

    # no reference artifacts: trials run, reported NO-REF, exit 0
    rc = _run_config1(tmp_path)
    assert rc == 0
    out = capfd.readouterr().out
    assert "NO-REF" in out
    metrics_path = (
        tmp_path / "parity_out" / "caltech101_4shot_rn50_baseline"
        / "metrics.json"
    )
    payload = json.loads(metrics_path.read_text())
    for key in ("top1_acc", "ece", "aece"):
        assert key in payload["metrics"]

    # fabricate a reference artifact within tolerance -> OK, exit 0
    ref_root = tmp_path / "refruns"
    ref_dir = ref_root / "caltech101_4shot_rn50_baseline"
    ref_dir.mkdir(parents=True)
    ref = {
        "metrics": {
            "top1_acc": payload["metrics"]["top1_acc"] + 0.2,
            "ece": payload["metrics"]["ece"] - 0.1,
            "aece": payload["metrics"]["aece"],
        }
    }
    (ref_dir / "metrics.json").write_text(json.dumps(ref))
    rc = _run_config1(tmp_path, reference_root=ref_root)
    assert rc == 0
    out = capfd.readouterr().out
    assert "[OK] caltech101_4shot_rn50_baseline" in out

    # out-of-tolerance reference -> FAIL, exit 1
    ref["metrics"]["top1_acc"] = payload["metrics"]["top1_acc"] + 5.0
    (ref_dir / "metrics.json").write_text(json.dumps(ref))
    rc = _run_config1(tmp_path, reference_root=ref_root)
    assert rc == 1
    out = capfd.readouterr().out
    assert "[FAIL] caltech101_4shot_rn50_baseline" in out
    assert "top1_acc" in out


def test_diff_metrics_unit():
    from scripts.parity_check import diff_metrics

    run = {"metrics": {"top1_acc": 90.0, "ece": 4.0, "aece": 3.0}}
    ref = {"metrics": {"top1_acc": 90.25, "ece": 4.3, "aece": 3.0}}
    ok, rows = diff_metrics(run, ref)
    assert ok  # 0.25 and exactly-0.3 deltas are within tolerance
    by_key = {r[0]: r for r in rows}
    assert by_key["top1_acc"][4] == "OK"
    assert by_key["ece"][4] == "OK"  # exactly at tolerance
    ref["metrics"]["ece"] = 4.35
    ok, rows = diff_metrics(run, ref)
    assert not ok

    ok, rows = diff_metrics(run, {"metrics": {"top1_acc": 90.0}})
    assert not ok  # missing keys fail loudly
    assert any(r[4] == "MISSING" for r in rows)


def test_all_parity_configs_enumerate():
    from scripts.parity_check import parity_trials

    names = set()
    for cid in range(1, 6):
        trials = parity_trials(cid)
        assert trials
        for t in trials:
            assert t["name"] not in names
            names.add(t["name"])
    # config 3 covers 3 datasets x 3 heads
    assert len(parity_trials(3)) == 9
    # config 5: imagenet train + 4 OOD evals chained to it
    c5 = parity_trials(5)
    assert len(c5) == 5
    assert all(t["eval_only_from"] for t in c5[1:])
