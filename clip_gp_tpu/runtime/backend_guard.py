"""Bounded wait for a wedged device backend.

The tunneled TPU backend wedges for stretches of 20-60 minutes (observed
repeatedly); a benchmark or driver compile-check launched into that state
hangs with no artifact. ``wait_for_backend`` probes with a killable
subprocess — the probe input varies per attempt so a byte-identical
(executable, args) program can't be answered from the backend's remote
execution cache — and retries until the backend answers or the budget
(``BENCH_BACKEND_WAIT_S``, default 2700 s) runs out. Status goes to stderr;
stdout stays untouched (bench.py reserves it for the one JSON result line).

No import-time side effects: safe to import from driver contract paths.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE_SRC = (
    "import sys, jax, jax.numpy as jnp;"
    "x = jnp.full((256, 256), int(sys.argv[1]), jnp.bfloat16);"
    "print('BENCH_PROBE_OK', float((x @ x).sum()))"
)


def probe_device_count(
    timeout_s: float = 120.0, platform: str | None = None
) -> int | None:
    """Count JAX devices in a killable subprocess; ``None`` on wedge/error.

    ``jax.devices()`` initializes the backend, and on the tunneled TPU that
    init hangs indefinitely while the tunnel is wedged — so any code path
    that must *decide* based on the device count (``dryrun_multichip``)
    cannot afford to ask in-process. The subprocess inherits the caller's
    environment, so it resolves the same platform the caller would.

    ``platform`` pins the subprocess to that backend via ``jax.config``
    (the only mechanism the axon plugin honors — it ignores the
    ``JAX_PLATFORMS`` env var).
    """
    pin = (
        f"jax.config.update('jax_platforms', {platform!r}); "
        if platform
        else ""
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             f"import jax; {pin}print('DEVCOUNT', len(jax.devices()))"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"[mesh] device-count probe timed out after {timeout_s:.0f}s "
            "(backend wedged?)",
            file=sys.stderr,
        )
        return None
    for line in out.stdout.splitlines():
        if line.startswith("DEVCOUNT "):
            return int(line.split()[1])
    print(
        f"[mesh] device-count probe failed (rc={out.returncode}): "
        f"{out.stderr.strip()[-500:]}",
        file=sys.stderr,
    )
    return None


def wait_for_backend(budget_s: float | None = None) -> bool:
    """Block until the backend answers a probe; bounded by the budget.

    Returns ``True`` when the backend answered (or failed fast with a real
    error the caller should surface by proceeding), ``False`` when the
    budget ran out on probe timeouts — i.e. the backend is wedged and any
    device work the caller dispatches next will likely hang. Callers with a
    stale-but-honest fallback (bench.py) should take it on ``False``.

    ``budget_s`` overrides the ``BENCH_BACKEND_WAIT_S`` budget — callers
    that re-probe after a mid-run transport failure (bench.py's wedge-crash
    retry) pass their REMAINING budget so the total wait stays bounded.
    """
    if os.environ.get("CLIP_GP_TPU_FORCE_CPU"):
        # the caller is pinned to the host CPU (train.py/sweep/bench guard);
        # probing the tunneled TPU would wait on hardware it won't use
        return True
    budget = (
        float(os.environ.get("BENCH_BACKEND_WAIT_S", "2700"))
        if budget_s is None
        else budget_s
    )
    deadline = time.monotonic() + budget
    attempt = 0
    fast_failures = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC, str(attempt)],
                capture_output=True,
                timeout=90,
                text=True,
            )
            if "BENCH_PROBE_OK" in out.stdout:
                if attempt > 1:
                    print(f"[bench] backend recovered (probe {attempt})",
                          file=sys.stderr)
                return True
            # non-timeout failure: the backend answered with an error, not a
            # wedge — waiting out the budget would just delay the same crash
            fast_failures += 1
            print(
                f"[bench] probe failed (rc={out.returncode}): "
                f"{out.stderr.strip()[-500:]}",
                file=sys.stderr,
            )
            if fast_failures >= 3:
                print(
                    "[bench] 3 non-timeout probe failures; proceeding so the "
                    "real error surfaces downstream",
                    file=sys.stderr,
                )
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(
                "[bench] backend probe never succeeded within "
                f"{budget:.0f}s; backend is wedged",
                file=sys.stderr,
            )
            return False
        print(
            f"[bench] backend not answering (probe {attempt}); retrying, "
            f"{remaining:.0f}s left in budget",
            file=sys.stderr,
        )
        time.sleep(min(45, max(1, remaining)))
