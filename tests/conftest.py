"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective logic is
exercised on XLA's host platform with 8 virtual devices instead (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).

The session environment boots an `axon` remote-TPU PJRT plugin from
sitecustomize (PALLAS_AXON_POOL_IPS) which hooks compilation for every
backend and makes even CPU eager ops ~3x slower with long sleep-waits. It
registers at interpreter start — before pytest loads this file — so the only
clean way out is to re-exec pytest once with the trigger env removed. The
re-exec must happen after pytest's fd-level capture is released, hence
pytest_configure + stop_global_capturing.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "true"
# persistent compile cache: the suite is compile-dominated on CPU; repeat
# runs hit the cache. The dir must be SPLIT by whether the axon compile hook
# is active: its remote CPU compiles carry machine features the local host
# lacks (prefer-no-scatter/gather), and loading them back in the clean
# re-exec'd process risks SIGILL (cpu_aot_loader warns on every load).
_cache_suffix = "_axon" if os.environ.get("PALLAS_AXON_POOL_IPS") else ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/jax_test_cache{_cache_suffix}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

_NEEDS_REEXEC = (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_SCT_TESTS_REEXEC") != "1"
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["_SCT_TESTS_REEXEC"] = "1"
    # the clean process must NOT share a compile cache with axon-hooked
    # processes (machine-feature mismatch, see header comment). The dir name
    # is versioned: a poisoned/corrupted entry once SEGFAULTED the suite at
    # cache-READ time (jax compilation_cache deserialization), and the only
    # safe recovery is abandoning the dir
    if env.get("JAX_COMPILATION_CACHE_DIR") == "/tmp/jax_test_cache_axon":
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache_clean_v2"
    args = [sys.executable, "-m", "pytest"] + list(config.invocation_params.args)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, args, env)


import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_process_memory_maps():
    """Drop jit executables after every test module.

    The full suite compiles 1000+ CPU executables in one process; their
    code pages accumulate memory MAPPINGS until the process hits
    vm.max_map_count (default 65530 — measured 62k+ maps at the ~90%
    mark), at which point the next XLA compile/serialize mmap fails and
    SEGFAULTS (4/4 reproductions at the same late module; either half of
    the suite alone passes). Modules rarely share jit signatures, so
    clearing between modules costs little and keeps the map count
    bounded."""
    yield
    import jax

    jax.clear_caches()



@pytest.fixture
def rng():
    return np.random.default_rng(0)
