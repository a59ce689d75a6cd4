"""Per-backend dispatch-budget calibration (runtime/dispatch_budget.py):
explicit env knobs always win, a persisted calibration rescales the
defaults to the measured backend speed, and the tunneled-v5e constants
remain the uncalibrated floor (round-4 verdict #6)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest  # noqa: E402

from clip_gp_tpu.runtime import dispatch_budget as db  # noqa: E402


@pytest.fixture()
def calib_dir(tmp_path, monkeypatch):
    """Point the calibration store at a private tmp dir (it lives next to
    the compile cache root)."""
    monkeypatch.setenv(
        "CLIP_GP_TPU_COMPILE_CACHE_DIR", str(tmp_path / "xla")
    )
    return tmp_path / "dispatch_calibration"


def test_env_knob_always_wins(calib_dir, monkeypatch):
    db.save_calibration(1e-3, key="k")
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "12345")
    assert db.resolve("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", 90_000, key="k") \
        == 12345
    # <=0 passes through so callers keep their "disabled" semantics
    monkeypatch.setenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", "0")
    assert db.resolve("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", 90_000, key="k") == 0


def test_uncalibrated_falls_back_to_default(calib_dir, monkeypatch):
    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", raising=False)
    assert db.resolve(
        "CLIP_GP_TPU_COCOOP_STEP_PROMPTS", 90_000, key="nope"
    ) == 90_000
    assert db.single_step_ceiling(key="nope") == db.DEFAULT_STEP_CEILING


def test_calibration_rescales_budgets(calib_dir, monkeypatch):
    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", raising=False)
    # a backend 2x FASTER than the v5e reference: budgets double
    db.save_calibration(db.V5E_PROBE_COST_S / 2, key="fast")
    b = db.resolve("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", 90_000, key="fast")
    assert b == pytest.approx(180_000, rel=0.01)
    # a 2x SLOWER backend halves them (crash avoidance)
    db.save_calibration(db.V5E_PROBE_COST_S * 2, key="slow")
    b = db.resolve("CLIP_GP_TPU_COCOOP_DISPATCH_PROMPTS", 90_000, key="slow")
    assert b == pytest.approx(45_000, rel=0.01)
    # the ceiling scales the same way
    c = db.single_step_ceiling(key="fast")
    assert c > db.DEFAULT_STEP_CEILING


def test_suspect_calibrations_are_clamped(calib_dir):
    # absurdly fast measurement: clamped at 16x the default
    db.save_calibration(db.V5E_PROBE_COST_S / 1000, key="toofast")
    assert db.resolve("X_UNSET_ENV", 90_000, key="toofast") == 90_000 * 16
    # absurdly slow: floored at default/4, never a degenerate budget
    db.save_calibration(db.V5E_PROBE_COST_S * 1000, key="tooslow")
    assert db.resolve("X_UNSET_ENV", 90_000, key="tooslow") == 90_000 // 4


def test_corrupt_or_nonpositive_calibration_ignored(calib_dir):
    path = db.calibration_path("bad")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("{not json")
    assert db.load_calibration("bad") is None
    db.save_calibration(-1.0, key="neg")
    assert db.load_calibration("neg") is None
    assert db.resolve("X_UNSET_ENV", 90_000, key="neg") == 90_000


def test_save_load_roundtrip_and_provenance(calib_dir):
    path = db.save_calibration(2.5e-4, note="unit test", key="rt")
    assert path == db.calibration_path("rt")
    assert db.load_calibration("rt") == pytest.approx(2.5e-4)
    import json

    payload = json.loads(path.read_text())
    assert payload["note"] == "unit test"
    assert "measured_at_utc" in payload


def test_cocoop_microbatch_uses_calibration(calib_dir, monkeypatch):
    """The production sizing rule picks up a per-backend calibration for
    the CURRENT device (cpu under the test conftest) when no env knob is
    set: a 2x-faster calibration doubles the step budget, so the same
    (T,B,K) shape allows more images per dispatch."""
    from clip_gp_tpu.parallel.trial_vmap import cocoop_microbatch_images

    monkeypatch.delenv("CLIP_GP_TPU_COCOOP_STEP_PROMPTS", raising=False)
    base = cocoop_microbatch_images(5, 32, 1000)  # uncalibrated: 16
    db.save_calibration(db.V5E_PROBE_COST_S / 2, key=db.device_key())
    fast = cocoop_microbatch_images(5, 32, 1000)  # 180k budget -> 32
    assert base == 16 and fast == 32
