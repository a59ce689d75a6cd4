"""Headline benchmark: CLIP ViT-B/16 feature extraction throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "imgs/s", "vs_baseline": N}

This is the dominant compute of every CLIP-GP run (the encoders are frozen and
features are extracted once per split — ref: trainers/adapter.py:886-926), so
imgs/sec/chip is the throughput north star (BASELINE.md). Weights are random
(weights don't affect throughput; no checkpoint egress in this environment);
images run in bf16 with fp32 LayerNorm/softmax.

Measurement protocol — dependency chain: on the tunneled axon backend,
``block_until_ready`` returns before remote execution completes and identical
(executable, args) calls can be served from a remote cache, so naive loops
measure dispatch, not compute. Here each iteration's input is derived from the
previous iteration's *output* (forcing sequential real execution of every
step) and only the final value is materialized to host; the timed window
therefore covers exactly `iters` genuine back-to-back device executions.

``vs_baseline``: the reference publishes no numbers (BASELINE.md: "none"), so
the denominator is a documented estimate of the reference's torch fp32
ViT-B/16 single-V100 encode throughput (~325 imgs/s at batch 128 — the class
of GPU the reference targets with its per-GPU trial scheduler).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_TORCH_V100_IMGS_PER_SEC = 325.0

BATCHES = (128, 256, 384, 512)
TIMED_ITERS = 20
WINDOWS = 3  # best-of windows: tunneled-backend RTT varies minute to minute


def measure(batch: int, int8: bool = False) -> float:
    # jax and the compile cache load lazily: only the measurement child ever
    # touches the backend — the parent just probes, spawns, and prints
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_gp_tpu.runtime import benchchain, compile_cache

    compile_cache.enable()
    from clip_gp_tpu.data.transforms import device_preprocess
    from clip_gp_tpu.models import clip_model, quantized
    from clip_gp_tpu.models.clip_loader import init_clip_params

    arch = clip_model.ARCHITECTURES["ViT-B/16"]
    # jitted init: one compiled program instead of thousands of eager
    # dispatches over the tunnel; params stay an explicit argument of the
    # step (closure weights would bake into the HLO as constants)
    params = jax.jit(init_clip_params, static_argnums=(1,))(
        jax.random.key(0), arch
    )
    if int8:
        params = quantized.quantize_visual_jit(params, arch)

    @jax.jit
    def step(params, x):
        images = device_preprocess(x)
        if int8:
            out = quantized.encode_image_q8(params, arch, images)
        else:
            out = clip_model.encode_image(
                params, arch, images, compute_dtype=jnp.bfloat16
            )
        # derive the next input from this output: forces every iteration to
        # really execute, in order, with a fresh (executable, args) pair
        return benchchain.advance_uint8(x, out), out

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 256, size=(batch, 224, 224, 3), dtype=np.uint8)
    )

    # warmup/compile, materialized to host
    x, out = step(params, x)
    float(jnp.sum(out))

    # best of several timed windows: the tunnel's round-trip overhead varies
    # minute to minute, and a single congested window would understate the
    # chip (each window still measures a genuine dependency chain)
    best = float("inf")
    for _ in range(WINDOWS):
        start = time.perf_counter()
        for _ in range(TIMED_ITERS):
            x, out = step(params, x)
        float(jnp.sum(out))  # materializes the whole chain
        best = min(best, time.perf_counter() - start)
    return batch * TIMED_ITERS / best


from clip_gp_tpu.runtime.backend_guard import wait_for_backend  # noqa: E402

# Last successful measurement, persisted so a wedged tunnel at driver time
# still yields an artifact (clearly marked stale) instead of a hang. The
# tunneled backend has wedged for 10+ hour stretches; the wait budget can't
# always outlast one. This file is COMMITTED (seeded from the round-3
# measured number) so the fallback survives a fresh checkout — round 4 had
# nothing on disk to fall back on; successful runs overwrite it in place.
LAST_GOOD_PATH = Path(__file__).resolve().parent / "BENCH_LAST_GOOD.json"

# Wedge-class child crashes (tunnel transport failures) are retried up to
# this many times within the BENCH_BACKEND_WAIT_S budget before falling
# back to the stale last-good number.
MAX_WEDGE_RETRIES = 3

# Marker another bench process (the re-measure queue) holds while running;
# module-level so tests never wait on a real flag left in /tmp.
RUNNING_FLAG_PATH = Path("/tmp/bench_running")


def load_stale_fallback(
    path: Path = LAST_GOOD_PATH,
    reason: str = "backend wedged past BENCH_BACKEND_WAIT_S",
) -> dict | None:
    """Last-good payload marked stale, or None if never measured."""
    try:
        payload = json.loads(path.read_text())
    except (OSError, ValueError):
        return None
    if not isinstance(payload, dict):
        return None
    payload["stale"] = True
    payload["stale_note"] = (
        f"{reason}; this is the last SUCCESSFUL measurement "
        f"(measured_at_utc={payload.get('measured_at_utc', 'unknown')}), "
        "not a fresh run"
    )
    return payload


def save_last_good(payload: dict, path: Path = LAST_GOOD_PATH) -> None:
    import os

    record = dict(payload)
    record["measured_at_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
    )
    # atomic: a driver-level kill mid-write must not destroy the fallback
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(record, indent=1) + "\n")
    os.replace(tmp, path)


def compute_payload() -> dict:
    """The full measurement: batch sweep + int8 secondary, as one payload."""
    by_batch = {str(b): round(measure(b), 1) for b in BATCHES}
    best_batch = max(by_batch, key=by_batch.get)
    imgs_per_sec = by_batch[best_batch]
    # secondary: the opt-in int8 serving mode (MODEL.INT8_INFERENCE, fused
    # Pallas int8 kernels) at the winning batch. The HEADLINE stays bf16 —
    # that is the default path and the one carrying the parity guarantees.
    int8_imgs_per_sec = round(measure(int(best_batch), int8=True), 1)
    return {
        "metric": "vitb16_feature_extract_imgs_per_sec_per_chip",
        "value": imgs_per_sec,
        "unit": "imgs/s",
        "vs_baseline": round(
            imgs_per_sec / REFERENCE_TORCH_V100_IMGS_PER_SEC, 2
        ),
        "batch": int(best_batch),
        "by_batch": by_batch,
        "int8_imgs_per_sec": int8_imgs_per_sec,
        "baseline_note": (
            "reference publishes no numbers; denominator is a "
            "documented ESTIMATE of torch fp32 ViT-B/16 on one V100 "
            "(~325 imgs/s) - see bench.py docstring"
        ),
    }


_CHILD_ENV = "CLIP_GP_TPU_BENCH_CHILD"

# Stderr signatures of a TUNNEL TRANSPORT failure killing the child
# mid-measurement. These are wedge-class events — the backend flapped, not a
# code bug — and must be retried/fallen-back, never reported as a bench bug.
# Round-4 evidence (BENCH_r04.json): `jax.errors.JaxRuntimeError: INTERNAL:
# http://127.0.0.1:8093/remote_compile: read body: response body closed
# before all bytes were read` crashed the child with 2610 s still left in
# the wait budget, and the old classifier hard-coded "crashed child = code
# bug" — erasing the round's headline number over a transient.
WEDGE_STDERR_SIGNATURES = (
    "remote_compile",          # the tunnel's compile RPC endpoint
    "remote_execute",          # the tunnel's execute RPC endpoint
    "response body closed",    # the exact r04 transport failure
    "INTERNAL: http",          # JaxRuntimeError INTERNAL wrapping an HTTP url
    "DEADLINE_EXCEEDED",       # RPC deadline — backend stalled mid-call
    "UNAVAILABLE:",            # gRPC/absl transport unavailability
    "Connection reset by peer",
    "Socket closed",
    "Failed to connect to remote server",
)


def stderr_indicates_wedge(stderr: str) -> bool:
    """True when a crashed child's stderr carries a transport-failure
    signature — i.e. the backend flapped mid-run and the crash is
    wedge-class (retryable), not a code bug."""
    return any(sig in stderr for sig in WEDGE_STDERR_SIGNATURES)


def run_measurement_child(timeout_s: float) -> tuple[str, dict | None]:
    """Run ``compute_payload`` in a killable subprocess.

    The backend can wedge MID-measurement — after the health probe
    succeeded — and a wedged device call never returns, so the measurement
    itself must be boundable. Returns (status, payload): status is "ok"
    (payload set), "timeout" (likely a mid-run wedge), "wedge_crash" (the
    child died with a tunnel-transport signature on stderr — retryable),
    or "crash" (the child died without one, or printed no payload — a code
    bug, NOT a wedge). The child's stderr is forwarded either way."""
    import os
    import subprocess

    env = dict(os.environ, **{_CHILD_ENV: "1"})
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve())],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired as e:
        stderr = e.stderr
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        sys.stderr.write(stderr or "")
        print(
            f"[bench] measurement child exceeded {timeout_s:.0f}s "
            "(backend wedged mid-run?); killed",
            file=sys.stderr,
        )
        return "timeout", None
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        if stderr_indicates_wedge(proc.stderr):
            print(
                f"[bench] measurement child died (rc={proc.returncode}) on a "
                "tunnel TRANSPORT failure — wedge-class, retryable",
                file=sys.stderr,
            )
            return "wedge_crash", None
        print(
            f"[bench] measurement child failed (rc={proc.returncode})",
            file=sys.stderr,
        )
        return "crash", None
    # the payload is the last stdout line that is a JSON object carrying
    # "metric" — stray trailing prints from libraries must not eat it
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            candidate = json.loads(line)
        except ValueError:
            continue
        if isinstance(candidate, dict) and "metric" in candidate:
            return "ok", candidate
    print("[bench] measurement child printed no JSON payload", file=sys.stderr)
    return "crash", None


def _emit_stale_or(fallback: dict, reason: str) -> None:
    """Print the stale last-good line, or ``fallback`` when none exists."""
    stale = load_stale_fallback(LAST_GOOD_PATH, reason=reason)
    print(json.dumps(stale if stale is not None else fallback))


def _error_payload(error: str) -> dict:
    return {
        "metric": "vitb16_feature_extract_imgs_per_sec_per_chip",
        "value": None,
        "unit": "imgs/s",
        "error": error,
    }


def _wait_for_other_bench(max_wait_s: float = 3600.0) -> None:
    """Block while another bench run marks itself active.

    The bench host has ONE core and serves one chip; concurrent benches
    contend and distort each other (CLAUDE.md bench discipline). The
    re-measure queue touches ``/tmp/bench_running`` around its runs; honor
    it (bounded) so a driver-invoked bench.py doesn't overlap it.

    The flag's OWNER (the queue runs bench.py itself, under its own flag)
    sets ``BENCH_OWNS_RUNNING_FLAG=1`` to skip this wait — otherwise it
    would stall an hour on its own marker."""
    import os

    if os.environ.get("BENCH_OWNS_RUNNING_FLAG") == "1":
        return
    flag = RUNNING_FLAG_PATH
    deadline = time.monotonic() + max_wait_s
    while flag.exists() and time.monotonic() < deadline:
        print("[bench] another bench is running; waiting", file=sys.stderr)
        time.sleep(30)


def main():
    import os

    if os.environ.get(_CHILD_ENV) == "1":
        # child: the parent already probed backend health and bounds us
        print(json.dumps(compute_payload()))
        return
    _wait_for_other_bench()
    # ONE overall backend-wait budget for the whole run: the initial health
    # probe and any wedge-crash re-probes share it, so total wall time stays
    # bounded no matter how often the tunnel flaps.
    budget = float(os.environ.get("BENCH_BACKEND_WAIT_S", "2700"))
    deadline = time.monotonic() + budget
    if not wait_for_backend(budget_s=budget):
        stale = load_stale_fallback(LAST_GOOD_PATH)
        if stale is not None:
            print(json.dumps(stale))
            return
        # never measured successfully: try anyway (the child below is
        # time-bounded) — no honest number exists to fall back on
    timeout_s = float(os.environ.get("BENCH_RUN_TIMEOUT_S", "2400"))
    wedge_crashes = 0
    while True:
        status, payload = run_measurement_child(timeout_s)
        if status != "wedge_crash":
            break
        # the child died on a tunnel TRANSPORT failure (remote_compile /
        # HTTP body / RPC signatures): the backend flapped mid-run. Re-probe
        # within the remaining budget and retry — round 4 lost its headline
        # number by classifying exactly this as a code bug.
        wedge_crashes += 1
        remaining = deadline - time.monotonic()
        if wedge_crashes >= MAX_WEDGE_RETRIES or remaining <= 60:
            _emit_stale_or(
                _error_payload(
                    "measurement child repeatedly died on tunnel transport "
                    "failures and no prior successful measurement exists to "
                    "fall back on"
                ),
                reason=(
                    f"{wedge_crashes} wedge-class child crash(es) exhausted "
                    "the retry budget"
                ),
            )
            return
        print(
            f"[bench] wedge-class crash {wedge_crashes}/{MAX_WEDGE_RETRIES}; "
            f"re-probing backend ({remaining:.0f}s left in budget) and "
            "retrying the measurement",
            file=sys.stderr,
        )
        if not wait_for_backend(budget_s=remaining):
            # the re-probe itself says wedged: don't burn another child
            _emit_stale_or(
                _error_payload(
                    "backend stayed wedged after a mid-run transport "
                    "failure and no prior successful measurement exists"
                ),
                reason="backend wedged after a wedge-class child crash",
            )
            return
    if status == "timeout":
        # a timed-out child is the mid-run-wedge signature: the stale
        # last-good number is the honest artifact
        _emit_stale_or(
            _error_payload(
                "backend wedged mid-measurement and no prior successful "
                "measurement exists to fall back on"
            ),
            reason=f"measurement child exceeded BENCH_RUN_TIMEOUT_S={timeout_s:.0f}s",
        )
        return
    if status == "crash":
        # a crashed child WITHOUT a transport signature is a CODE bug —
        # surface it rather than masking it behind the stale number forever
        print(
            json.dumps(
                _error_payload(
                    "measurement child crashed (see stderr); this is a "
                    "bench bug, not a backend wedge"
                )
            )
        )
        return
    # print first, persist best-effort: a failed write must not destroy a
    # successful measurement or the one-JSON-line contract
    print(json.dumps(payload))
    try:
        save_last_good(payload, LAST_GOOD_PATH)
    except OSError as e:
        print(f"[bench] could not persist last-good: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
