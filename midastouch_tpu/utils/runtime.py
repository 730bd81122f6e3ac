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


def retry_transient(fn, *args, attempts: int = 3, block: bool = True, **kwargs):
    """Call fn, retrying on transient TPU-tunnel failures (the remote
    compile service occasionally drops the response body mid-transfer:
    'INTERNAL: ... remote_compile: read body ...'). Safe for pure/jitted
    calls — inputs are unchanged on retry. Non-transient errors re-raise
    immediately.

    block=True waits for device completion inside the try so execution-phase
    transient errors are retried too; pass block=False for callers that
    pipeline host prep against async dispatch and handle late failures
    themselves (blocking would serialize their dispatch for nothing)."""
    import time as _time

    if attempts < 1:
        raise ValueError(f"attempts must be >= 1, got {attempts}")
    for k in range(attempts):
        try:
            out = fn(*args, **kwargs)
            # jitted calls return before execution completes; block here so
            # execution-phase transient errors (DEADLINE_EXCEEDED mid-run,
            # tunnel drops during device->host transfer) surface inside the
            # try and get retried instead of exploding at a later consumer
            if block:
                try:
                    import jax

                    jax.block_until_ready(out)
                except ImportError:
                    pass
            return out
        except Exception as e:  # jax.errors.JaxRuntimeError subclasses vary
            msg = str(e)
            transient = (
                "remote_compile" in msg
                or "response body closed" in msg
                or "DEADLINE_EXCEEDED" in msg
                or "UNAVAILABLE" in msg
            )
            if not transient or k == attempts - 1:
                raise
            wait = 5.0 * (k + 1)
            print(f"[runtime] transient TPU error, retry {k+1}/{attempts-1} "
                  f"in {wait:.0f}s: {msg[:120]}", flush=True)
            _time.sleep(wait)


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
