"""Runtime setup: persistent XLA compilation cache + profiling helpers.

The TPU-tunnel backend in this environment compiles slowly (~20-40 s per
program); the on-disk cache makes every program after the first run load
in milliseconds. Apps and bench call `setup()` before first trace.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("MIDASTOUCH_FORCE_CPU") == "1":
        # the axon TPU plugin re-pins JAX_PLATFORMS during import, so the
        # usual env var silently fails — this is the reliable CPU escape
        # hatch (used by scripts when the chip is busy with a training run)
        jax.config.update("jax_platforms", "cpu")

    cache_dir = cache_dir or os.environ.get(
        "MIDASTOUCH_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


def host_cpu():
    """The host CPU jax device, for shape-varying host-side prep (pose
    synthesis, odometry tables). Through the TPU tunnel every new shape
    costs a ~20-40 s compile; these ops are microseconds of scalar math
    and belong on the host backend. Returns None (no-op for
    jax.default_device) if the CPU backend is unavailable."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def profile_trace(log_dir: str):
    """Context manager around jax.profiler (replaces the reference's yappi
    wrapping, filter.py:262-277)."""
    import jax

    return jax.profiler.trace(log_dir)
