"""Test configuration.

Tests must run on LOCAL CPU with an 8-device virtual mesh.  This image force-
registers the remote 'axon' TPU backend in every interpreter through a
PYTHONPATH sitecustomize (it runs before pytest, so mutating os.environ here
is too late) — when we detect it, re-exec pytest once with the axon trigger
variable removed and CPU forced.
"""

import hashlib
import os
import sys


def _cpu_cache_dir() -> str:
    """Compile-cache dir fingerprinted by host CPU features + jaxlib.

    The rounds run on different machines; XLA:CPU AOT executables cached on
    an avx512/amx host SEGFAULT (SIGILL) when loaded on a host without
    those features — jax loads them anyway with only a warning.  Keying the
    directory by the cpuinfo flags makes stale cross-machine entries
    unreachable instead of fatal.  The jaxlib version is part of the key
    too: XLA's AOT target features include compiler-version-dependent
    preferences (e.g. +prefer-no-scatter), so entries written by another
    jaxlib on a same-ISA host still mismatch at load time."""
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        # model name too: XLA picks +prefer-no-gather/+prefer-no-scatter
        # from the CPU *model*, so two hosts with identical `flags` lines
        # can still write mutually unloadable AOT entries
        flags = " ".join(
            line
            for line in text.splitlines()
            if line.startswith(("flags", "model name"))
        )[:4096]
    except OSError:
        flags = ""
    try:
        from importlib.metadata import version

        flags += " jaxlib=" + version("jaxlib")
    except Exception:
        pass
    tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return f"/root/.cache/jax_comp_cpu_{tag}"


if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_VIPE_TEST_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_VIPE_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
