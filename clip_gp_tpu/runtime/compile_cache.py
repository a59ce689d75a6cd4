"""Persistent XLA compile-cache setup shared by every CLI/bench entry.

First compile over the tunneled backend is slow (~20-40 s); the on-disk
cache makes every later process start warm. Disable with
``CLIP_GP_TPU_NO_COMPILE_CACHE=1`` (e.g. to measure cold compiles).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Hash of this host's CPU feature flags.

    The cache directory may outlive the machine that wrote it (the image
    moves between heterogeneous hosts). XLA:CPU AOT executables are compiled
    for the *compiling* host's CPU features, and loading one on a host with
    fewer features risks SIGILL. Namespacing the cache by CPU flags turns
    those unsafe loads into clean misses. (Note: XLA's cpu_aot_loader
    mismatch warning can still fire for same-host entries — it compares its
    own tuning prefs like ``+prefer-no-scatter`` against raw CPUID flags;
    that residual warning is spurious and harmless.)
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 lists capabilities under "flags", ARM under "Features"
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def _accelerator_plugin_present() -> bool:
    """Whether any PJRT accelerator plugin is even installed — checked
    WITHOUT initializing a backend (initializing the tunneled TPU plugin can
    hang while the tunnel is wedged). When no plugin exists, jax's default
    backend can only ever be CPU, so the process must use the
    host-namespaced cache even though nothing forced ``jax_platforms``."""
    env = os.environ.get("JAX_PLATFORMS", "")
    if env and not env.startswith("cpu"):
        return True  # e.g. JAX_PLATFORMS=axon on the tunneled-TPU image
    try:
        from importlib import metadata

        if any(True for _ in metadata.entry_points(group="jax_plugins")):
            return True
    except Exception:
        pass
    import importlib.util

    for mod in ("jax_plugins", "libtpu"):
        try:
            if importlib.util.find_spec(mod) is not None:
                return True
        except (ImportError, ValueError):
            pass
    return False


def enable(min_compile_secs: float = 0.5) -> None:
    """Point jax at the shared on-disk compilation cache (best-effort)."""
    if os.environ.get("CLIP_GP_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    # CPU processes namespace by host CPU features — XLA:CPU AOT executables
    # are feature-specific and risk SIGILL when loaded on a different host.
    # "CPU process" means jax_platforms forced to cpu (tests, virtual-mesh
    # children) OR no accelerator plugin installed at all (a host where the
    # unforced default backend silently falls back to CPU). Accelerator-path
    # processes share one dir: TPU executables are host-CPU-independent, and
    # splitting them would forfeit the warm start (20-40 s/compile over the
    # tunnel) whenever the image moves hosts.
    try:
        forced_cpu = (jax.config.jax_platforms or "").startswith("cpu")
    except Exception:
        forced_cpu = False
    cpu_process = forced_cpu or not _accelerator_plugin_present()
    subdir = _host_fingerprint() if cpu_process else "accel"
    # an explicit override relocates the cache ROOT; the safety subdir still
    # applies underneath it (a flat relocated dir shared between
    # heterogeneous hosts would reintroduce the SIGILL loads)
    root = os.environ.get(
        "CLIP_GP_TPU_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/clip_gp_tpu/xla"),
    )
    cache_dir = os.path.join(root, subdir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
