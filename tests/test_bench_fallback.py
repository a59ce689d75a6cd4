"""bench.py must produce an artifact even when the tunneled backend is
wedged past the wait budget: the last SUCCESSFUL measurement is persisted
and replayed with an explicit ``stale`` marker (wedges of 10+ hours have
been observed; the driver runs bench.py unconditionally at round end)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest  # noqa: E402

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_running_flag(tmp_path, monkeypatch):
    """Never let these tests block on a real /tmp/bench_running left by the
    re-measure queue (main() honors it for up to an hour)."""
    monkeypatch.setattr(
        bench, "RUNNING_FLAG_PATH", tmp_path / "bench_running"
    )


def test_last_good_round_trip(tmp_path):
    path = tmp_path / "BENCH_LAST_GOOD.json"
    payload = {"metric": "m", "value": 123.4, "unit": "imgs/s"}
    bench.save_last_good(payload, path)

    saved = json.loads(path.read_text())
    assert saved["value"] == 123.4
    assert "measured_at_utc" in saved

    stale = bench.load_stale_fallback(path)
    assert stale["stale"] is True
    assert saved["measured_at_utc"] in stale["stale_note"]
    assert stale["value"] == 123.4
    # save_last_good must not mutate the caller's payload
    assert "measured_at_utc" not in payload


def test_fallback_missing_or_corrupt(tmp_path):
    assert bench.load_stale_fallback(tmp_path / "absent.json") is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench.load_stale_fallback(bad) is None
    # valid JSON but not an object: also rejected
    nondict = tmp_path / "nondict.json"
    nondict.write_text("[1, 2]")
    assert bench.load_stale_fallback(nondict) is None


def test_main_emits_stale_line_when_wedged(tmp_path, monkeypatch, capsys):
    path = tmp_path / "BENCH_LAST_GOOD.json"
    bench.save_last_good({"metric": "m", "value": 99.0}, path)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: False
    )
    # measure() must never run on the wedged path
    monkeypatch.setattr(
        bench, "measure", lambda *a, **k: (_ for _ in ()).throw(AssertionError)
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # the one-JSON-line driver contract
    rec = json.loads(out[0])
    assert rec["stale"] is True and rec["value"] == 99.0


def test_main_success_path_persists_last_good(tmp_path, monkeypatch, capsys):
    path = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: True
    )
    payload = {"metric": "m", "value": 123.0, "unit": "imgs/s"}
    monkeypatch.setattr(
        bench, "run_measurement_child", lambda t: ("ok", dict(payload))
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 123.0
    assert json.loads(path.read_text())["value"] == 123.0  # persisted


def test_main_midrun_wedge_falls_back_to_stale(tmp_path, monkeypatch, capsys):
    """The backend can wedge AFTER the health probe succeeded; a timed-out
    measurement child must yield the stale line (with a note naming the
    run timeout, not the probe budget), not a hang."""
    path = tmp_path / "BENCH_LAST_GOOD.json"
    bench.save_last_good({"metric": "m", "value": 88.0}, path)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: True
    )
    monkeypatch.setattr(
        bench, "run_measurement_child", lambda t: ("timeout", None)
    )
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stale"] is True and rec["value"] == 88.0
    assert "BENCH_RUN_TIMEOUT_S" in rec["stale_note"]


def test_main_midrun_wedge_without_stale_reports_error(
    tmp_path, monkeypatch, capsys
):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", tmp_path / "absent.json")
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: True
    )
    monkeypatch.setattr(
        bench, "run_measurement_child", lambda t: ("timeout", None)
    )
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] is None and "wedged" in rec["error"]


def test_main_child_crash_surfaces_error_not_stale(
    tmp_path, monkeypatch, capsys
):
    """A crashed child is a bench BUG: it must surface as an error line,
    never be masked by replaying the stale number as if wedged."""
    path = tmp_path / "BENCH_LAST_GOOD.json"
    bench.save_last_good({"metric": "m", "value": 88.0}, path)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: True
    )
    monkeypatch.setattr(
        bench, "run_measurement_child", lambda t: ("crash", None)
    )
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] is None and "bench bug" in rec["error"]
    assert "stale" not in rec


# The exact stderr that killed round 4's measurement child (BENCH_r04.json):
# a tunnel transport failure the old classifier mislabeled as a code bug.
R04_WEDGE_TRACEBACK = """\
Traceback (most recent call last):
  File "/root/repo/bench.py", line 316, in <module>
    main()
  File "/root/repo/bench.py", line 85, in measure
    x, out = step(params, x)
jax.errors.JaxRuntimeError: INTERNAL: http://127.0.0.1:8093/remote_compile: \
read body: response body closed before all bytes were read
"""


def test_wedge_signature_classification():
    assert bench.stderr_indicates_wedge(R04_WEDGE_TRACEBACK)
    # RPC-layer variants seen from the tunnel
    assert bench.stderr_indicates_wedge("DEADLINE_EXCEEDED: remote call")
    assert bench.stderr_indicates_wedge("UNAVAILABLE: connection dropped")
    # a genuine code bug must NOT classify as a wedge
    assert not bench.stderr_indicates_wedge(
        "Traceback (most recent call last):\n"
        '  File "bench.py", line 85, in measure\n'
        "TypeError: unsupported operand type(s) for @: 'NoneType' and 'int'\n"
    )
    assert not bench.stderr_indicates_wedge("")


def test_run_measurement_child_classifies_wedge_crash(monkeypatch):
    import subprocess
    from types import SimpleNamespace

    def fake_run(*a, **k):
        return SimpleNamespace(
            returncode=1, stderr=R04_WEDGE_TRACEBACK, stdout=""
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.run_measurement_child(10.0) == ("wedge_crash", None)

    def fake_run_bug(*a, **k):
        return SimpleNamespace(
            returncode=1, stderr="TypeError: boom\n", stdout=""
        )

    monkeypatch.setattr(subprocess, "run", fake_run_bug)
    assert bench.run_measurement_child(10.0) == ("crash", None)


def test_main_wedge_crash_retries_then_succeeds(tmp_path, monkeypatch, capsys):
    """A transport-failure child crash must re-probe and retry — round 4
    lost its headline number by giving up on exactly this."""
    path = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    probes = []
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: probes.append(1) or True
    )
    statuses = iter([("wedge_crash", None), ("ok", {"metric": "m", "value": 42.0})])
    monkeypatch.setattr(
        bench, "run_measurement_child", lambda t: next(statuses)
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 42.0
    assert len(probes) == 2  # initial probe + the post-crash re-probe
    assert json.loads(path.read_text())["value"] == 42.0  # persisted


def test_main_wedge_crash_exhausts_retries_to_stale(
    tmp_path, monkeypatch, capsys
):
    path = tmp_path / "BENCH_LAST_GOOD.json"
    bench.save_last_good({"metric": "m", "value": 77.0}, path)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: True
    )
    calls = []
    monkeypatch.setattr(
        bench,
        "run_measurement_child",
        lambda t: calls.append(1) or ("wedge_crash", None),
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["stale"] is True and rec["value"] == 77.0
    assert "wedge-class" in rec["stale_note"]
    assert len(calls) == bench.MAX_WEDGE_RETRIES


def test_main_wedge_crash_reprobe_failure_goes_stale(
    tmp_path, monkeypatch, capsys
):
    """When the post-crash re-probe itself times out, don't burn another
    child — emit the stale line immediately."""
    path = tmp_path / "BENCH_LAST_GOOD.json"
    bench.save_last_good({"metric": "m", "value": 66.0}, path)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", path)
    probe_results = iter([True, False])  # healthy at start, wedged on re-probe
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda budget_s=None: next(probe_results)
    )
    calls = []
    monkeypatch.setattr(
        bench,
        "run_measurement_child",
        lambda t: calls.append(1) or ("wedge_crash", None),
    )
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stale"] is True and rec["value"] == 66.0
    assert len(calls) == 1  # no second child after the failed re-probe


def test_committed_last_good_survives_fresh_checkout():
    """The durable-fallback contract: BENCH_LAST_GOOD.json is a COMMITTED
    repo file with a real finite value, so a fresh checkout always has an
    honest (stale-marked) number to fall back on."""
    import math
    import subprocess

    payload = json.loads(bench.LAST_GOOD_PATH.read_text())
    assert payload["metric"] == "vitb16_feature_extract_imgs_per_sec_per_chip"
    assert math.isfinite(payload["value"]) and payload["value"] > 0
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", bench.LAST_GOOD_PATH.name],
        cwd=bench.LAST_GOOD_PATH.parent,
        capture_output=True,
    )
    assert tracked.returncode == 0, "BENCH_LAST_GOOD.json must be git-tracked"


def test_run_measurement_child_parses_payload_amid_noise(monkeypatch):
    """The payload is the last JSON OBJECT carrying 'metric'; stray
    trailing stdout lines (even valid JSON scalars) must not eat it."""
    import subprocess
    from types import SimpleNamespace

    def fake_run(*a, **k):
        return SimpleNamespace(
            returncode=0,
            stderr="",
            stdout='{"metric": "m", "value": 5.0}\nnot json\n0\n',
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    status, payload = bench.run_measurement_child(10.0)
    assert status == "ok" and payload["value"] == 5.0

    def fake_run_nojson(*a, **k):
        return SimpleNamespace(returncode=0, stderr="", stdout="42\n")

    monkeypatch.setattr(subprocess, "run", fake_run_nojson)
    assert bench.run_measurement_child(10.0) == ("crash", None)


def test_child_mode_prints_payload_directly(monkeypatch, capsys):
    monkeypatch.setenv(bench._CHILD_ENV, "1")
    monkeypatch.setattr(bench, "compute_payload", lambda: {"value": 7.0})
    # neither the probe nor the subprocess runner may be touched in a child
    monkeypatch.setattr(
        bench,
        "wait_for_backend",
        lambda budget_s=None: (_ for _ in ()).throw(AssertionError),
    )
    monkeypatch.setattr(
        bench,
        "run_measurement_child",
        lambda t: (_ for _ in ()).throw(AssertionError),
    )
    bench.main()
    assert json.loads(capsys.readouterr().out.strip())["value"] == 7.0


def test_wait_for_other_bench_blocks_until_flag_clears(monkeypatch):
    """main() defers to a flagged concurrent bench, polling until it ends."""
    flag = bench.RUNNING_FLAG_PATH
    flag.write_text("")
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        flag.unlink()  # the other bench finishes during our first poll

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    bench._wait_for_other_bench(max_wait_s=120.0)
    assert sleeps  # it did wait at least once


def test_flag_owner_skips_the_wait(monkeypatch):
    """The re-measure queue runs bench.py under its OWN flag; the owner
    env var must bypass the wait or the queue stalls an hour on itself."""
    bench.RUNNING_FLAG_PATH.write_text("")
    monkeypatch.setenv("BENCH_OWNS_RUNNING_FLAG", "1")
    monkeypatch.setattr(
        bench.time,
        "sleep",
        lambda s: (_ for _ in ()).throw(AssertionError("must not wait")),
    )
    bench._wait_for_other_bench(max_wait_s=120.0)
    bench.RUNNING_FLAG_PATH.unlink()
