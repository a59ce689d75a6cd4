"""Profiling subsystem: phase timers and trace hooks."""

import time

from clip_gp_tpu.runtime import profiling


def test_phase_timer_accumulates():
    profiling.reset_phases()
    with profiling.phase_timer("alpha"):
        time.sleep(0.01)
    with profiling.phase_timer("alpha"):
        time.sleep(0.01)
    with profiling.phase_timer("beta"):
        pass
    report = profiling.phase_report()
    assert report["alpha"]["count"] == 2
    assert report["alpha"]["total_s"] >= 0.02
    assert report["beta"]["count"] == 1
    profiling.reset_phases()
    assert profiling.phase_report() == {}


def test_maybe_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("CLIP_GP_TPU_PROFILE_DIR", raising=False)
    with profiling.maybe_trace("x"):
        pass  # must be a no-op


def test_maybe_trace_writes_profile(monkeypatch, tmp_path):
    monkeypatch.setenv("CLIP_GP_TPU_PROFILE_DIR", str(tmp_path))
    import jax.numpy as jnp

    with profiling.maybe_trace("unit"):
        jnp.ones(4).sum().block_until_ready()
    out = tmp_path / "unit"
    assert out.exists()
    assert any(out.rglob("*"))  # trace artifacts written
