"""Test environment: force CPU JAX with a virtual 8-device mesh.

The container's sitecustomize imports jax at interpreter startup (TPU plugin
registration), so env vars alone are latched too late — use jax.config.
Backends initialize lazily, so setting XLA_FLAGS + jax_platforms here (before
any computation) still takes effect.
"""

import faulthandler
import os
import signal

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Reference parity targets float32 math; keep MXU-style default off for tests.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite is dominated by jit compiles of the
# same graphs run-over-run; caching them cuts repeat-run wall time sharply.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Suite hygiene: no test may hang a session, and the default run stays fast.
#
#  - Per-test timeout (default 300 s, override with @pytest.mark.timeout(N)
#    or TEST_TIMEOUT=N): SIGALRM raises a graceful TimeoutError; a
#    faulthandler watchdog hard-exits 60 s later if the main thread is parked
#    in C (the observed futex-park hang mode can't be interrupted by signals).
#  - @pytest.mark.slow (the interpreter-mode kernel-gradient tests) is skipped
#    by default; run with --runslow or RUN_SLOW=1 for the full suite.
# ---------------------------------------------------------------------------

DEFAULT_TEST_TIMEOUT = int(os.environ.get("TEST_TIMEOUT", "300"))


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (interpreter-mode "
                          "kernel gradients; several minutes each)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long interpreter-mode kernel test, skipped unless "
                   "--runslow / RUN_SLOW=1")
    config.addinivalue_line(
        "markers", "timeout(seconds): per-test timeout override")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow: run with --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(autouse=True)
def _timeout_guard(request):
    timeout = DEFAULT_TEST_TIMEOUT
    marker = request.node.get_closest_marker("timeout")
    if marker is not None:
        timeout = int(marker.args[0])
    if timeout <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"{request.node.nodeid} exceeded {timeout}s (TEST_TIMEOUT)")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout)
    # Hard backstop: if the main thread is futex-parked in C, SIGALRM's
    # Python-level handler never runs; dump all stacks and _exit instead of
    # hanging the session.
    faulthandler.dump_traceback_later(timeout + 60, exit=True)
    try:
        yield
    finally:
        signal.alarm(0)
        faulthandler.cancel_dump_traceback_later()
        signal.signal(signal.SIGALRM, old)
