"""Unit tests for runtime/backend_guard.wait_for_backend.

The guard probes the device backend with killable subprocesses and waits out
wedges (observed 20-60 min on the tunneled TPU). These tests fake
``subprocess.run`` so no real backend is needed; they pin the three exit
conditions: immediate success, non-timeout failures (proceed after 3 so the
real error surfaces downstream), and budget exhaustion on persistent timeouts.
"""

from __future__ import annotations

import subprocess

from clip_gp_tpu.runtime import backend_guard


class _FakeCompleted:
    def __init__(self, stdout="", stderr="", returncode=0):
        self.stdout = stdout
        self.stderr = stderr
        self.returncode = returncode


def test_returns_immediately_on_healthy_backend(monkeypatch):
    calls = []

    def fake_run(cmd, **kwargs):
        calls.append(cmd)
        return _FakeCompleted(stdout="BENCH_PROBE_OK 42.0\n")

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    monkeypatch.setattr(backend_guard.time, "sleep", lambda s: None)
    backend_guard.wait_for_backend()
    assert len(calls) == 1


def test_retries_through_timeouts_until_success(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, **kwargs):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=90)
        return _FakeCompleted(stdout="BENCH_PROBE_OK 7.0\n")

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    monkeypatch.setattr(backend_guard.time, "sleep", lambda s: None)
    backend_guard.wait_for_backend()
    assert state["n"] == 3


def test_probe_inputs_vary_per_attempt(monkeypatch):
    """Each probe must carry a distinct argv (cache-busting: a byte-identical
    program could be answered from the backend's remote execution cache)."""
    seen = []

    def fake_run(cmd, **kwargs):
        seen.append(cmd[-1])
        if len(seen) < 3:
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=90)
        return _FakeCompleted(stdout="BENCH_PROBE_OK 1.0\n")

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    monkeypatch.setattr(backend_guard.time, "sleep", lambda s: None)
    backend_guard.wait_for_backend()
    assert len(set(seen)) == len(seen)


def test_proceeds_after_three_fast_failures(monkeypatch):
    """A backend that *answers* with an error is not a wedge — waiting out the
    budget would only delay the same crash, so the guard gives up after 3."""
    state = {"n": 0}

    def fake_run(cmd, **kwargs):
        state["n"] += 1
        return _FakeCompleted(stderr="boom", returncode=1)

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    monkeypatch.setattr(backend_guard.time, "sleep", lambda s: None)
    backend_guard.wait_for_backend()
    assert state["n"] == 3


def test_budget_exhaustion_returns_instead_of_hanging(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, **kwargs):
        state["n"] += 1
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=90)

    monkeypatch.setattr(backend_guard.subprocess, "run", fake_run)
    monkeypatch.setattr(backend_guard.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "0")
    backend_guard.wait_for_backend()  # must return, not loop forever
    assert state["n"] == 1


def test_host_fingerprint_stable_and_filesystem_safe():
    from clip_gp_tpu.runtime.compile_cache import _host_fingerprint

    fp = _host_fingerprint()
    assert fp == _host_fingerprint()  # deterministic on one host
    assert fp and "/" not in fp and len(fp) <= 32


def test_compile_cache_dir_is_host_namespaced(monkeypatch):
    # cache entries AOT-compiled for another host's CPU features must miss
    # cleanly (SIGILL risk otherwise) — the dir embeds a CPU-flags hash
    import jax

    from clip_gp_tpu.runtime import compile_cache

    monkeypatch.delenv("CLIP_GP_TPU_COMPILE_CACHE_DIR", raising=False)
    monkeypatch.delenv("CLIP_GP_TPU_NO_COMPILE_CACHE", raising=False)
    before = jax.config.jax_compilation_cache_dir
    try:
        compile_cache.enable()
        assert jax.config.jax_compilation_cache_dir.endswith(
            compile_cache._host_fingerprint()
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
