"""Test configuration.

Tests must run on LOCAL CPU with an 8-device virtual mesh.  This image force-
registers the remote 'axon' TPU backend in every interpreter through a
PYTHONPATH sitecustomize (it runs before pytest, so mutating os.environ here
is too late) — so we always re-launch pytest once as a SUPERVISED child with
the axon trigger variable removed and CPU forced, purging the compile cache
and retrying once if the child dies on a signal (a poisoned XLA:CPU AOT
cache entry segfaults on load; jax only warns).
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
    # boot_id: VMs expose a GENERIC virtualized cpuinfo ("Intel(R) Xeon(R)
    # Processor @ 2.10GHz") identical across different physical hosts, while
    # XLA detects the real microarchitecture via CPUID — two hosts can hash
    # alike here yet write mutually incompatible AOT executables.  Keying by
    # boot makes the dir private to one machine instance; sessions on the
    # same boot still share a warm cache.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            flags += " boot=" + f.read().strip()
    except OSError:
        pass
    tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return f"/root/.cache/jax_comp_cpu_{tag}"


_IS_SUPERVISOR = not os.environ.get("_VIPE_TEST_REEXEC")


def pytest_configure(config):
    """Supervisor process: re-launch pytest as a clean-environment child and
    never reach collection ourselves.  Runs at configure (not import) time so
    pytest's global output capture can be stopped first — otherwise the
    child's entire output lands in the supervisor's capture buffer and is
    discarded at exit.  If the child dies on a signal, purge the compile
    cache and retry once (a poisoned XLA:CPU AOT entry segfaults on load)."""
    if not _IS_SUPERVISOR:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
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
    import glob
    import shutil
    import subprocess

    def run_child(args):
        cmd = [sys.executable, "-m", "pytest"] + args
        rc = subprocess.run(cmd, env=env).returncode
        if rc in (-11, -4, -6, 132, 134, 139):
            cache = env["JAX_COMPILATION_CACHE_DIR"]
            sys.stderr.write(
                f"pytest died with signal (rc={rc}); purging {cache} and "
                "retrying once\n"
            )
            shutil.rmtree(cache, ignore_errors=True)
            rc = subprocess.run(cmd, env=env).returncode
        return rc

    # Whole-suite runs execute ONE CHILD PER TEST FILE: a single process
    # accumulates every compiled executable + live buffer across 30 files,
    # and XLA:CPU deterministically segfaults partway through under that
    # load (reproduced at test_gdino after hundreds of compilations; each
    # file passes in isolation).  Per-file children bound process state,
    # keep one file's crash from killing the rest, and reuse warm compiles
    # through the persistent cache.  Explicit selections (file paths,
    # ::node ids, -k) keep the single-child behavior.
    flags_args = [a for a in sys.argv[1:] if a.startswith("-")]
    targets = [a for a in sys.argv[1:] if not a.startswith("-")]
    here = os.path.dirname(os.path.abspath(__file__))
    whole_suite = all(
        os.path.isdir(t) and os.path.samefile(t, here) for t in targets
    ) and "-k" not in flags_args
    if not whole_suite:
        os._exit(run_child(sys.argv[1:]))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    final_rc = 0
    for f in files:
        rc = run_child(flags_args + [f])
        if rc not in (0, 5):  # 5 = file collected no tests (fine)
            final_rc = rc if final_rc == 0 else final_rc
            if "-x" in flags_args or "--exitfirst" in flags_args:
                break
    os._exit(final_rc)


if _IS_SUPERVISOR:
    # never import jax/test modules in the supervisor — pytest_configure
    # above exits before collection
    collect_ignore_glob = ["*"]

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
