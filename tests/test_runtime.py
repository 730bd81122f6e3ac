"""utils/runtime.py + StageTimer sit on the measurement path every
benchmark and pipeline number depends on (VERDICT r2 weak #8) — exercised
here so a regression can't silently skew results."""

import os

import jax
import pytest

from midastouch_tpu.utils import runtime
from midastouch_tpu.utils.misc import StageTimer


def test_setup_configures_compile_cache(tmp_path, monkeypatch):
    cache = str(tmp_path / "jc")
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("MIDASTOUCH_TPU_JAX_CACHE", cache)
    try:
        runtime.setup()
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        # global jax.config outlives the test; don't leave later compiles
        # caching into this throwaway tmp_path
        jax.config.update("jax_compilation_cache_dir", prev)


def test_setup_force_cpu_env(monkeypatch):
    # conftest already pins cpu; the escape hatch must keep that pin (it
    # exists because JAX_PLATFORMS alone is overridden by the TPU plugin)
    monkeypatch.setenv("MIDASTOUCH_FORCE_CPU", "1")
    runtime.setup()
    assert jax.devices()[0].platform == "cpu"


def test_retry_transient_retries_then_succeeds(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("INTERNAL: remote_compile: read body failed")
        return 42

    assert runtime.retry_transient(flaky, attempts=3) == 42
    assert calls["n"] == 3


def test_retry_transient_reraises_non_transient():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        runtime.retry_transient(broken, attempts=3)
    assert calls["n"] == 1  # no retry on non-transient errors


def test_retry_transient_gives_up_after_attempts(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: tunnel")

    with pytest.raises(RuntimeError):
        runtime.retry_transient(always_down, attempts=3)
    assert calls["n"] == 3


def test_retry_transient_rejects_nonpositive_attempts():
    with pytest.raises(ValueError):
        runtime.retry_transient(lambda: 1, attempts=0)


def test_retry_transient_blocks_on_jax_outputs(monkeypatch):
    # execution-phase errors surface at block_until_ready, inside the try —
    # verify the result is materialized before retry_transient returns
    out = runtime.retry_transient(lambda: jax.numpy.arange(4) * 2)
    assert out.is_ready()


def test_host_cpu_returns_cpu_device():
    dev = runtime.host_cpu()
    assert dev is not None and dev.platform == "cpu"


def test_stage_timer_accumulates_and_averages():
    t = StageTimer(stages=("a", "b"))
    for _ in range(4):
        t.start("a")
        t.stop()
    t.start("b")
    dt = t.stop(jax.numpy.ones(4))  # device-sync variant
    assert dt >= 0.0
    avg = t.averages()
    assert set(avg) == {"a", "b"}
    assert len(t.history["a"]) == 4 and len(t.history["b"]) == 1
    assert t.iteration_time() == pytest.approx(
        t.current["a"] + t.current["b"]
    )


def test_profile_trace_writes_trace_dir(tmp_path):
    with runtime.profile_trace(str(tmp_path)):
        jax.block_until_ready(jax.numpy.ones(8) * 2)
    assert os.listdir(str(tmp_path))  # trace artifacts exist
