"""Axon tunnel dispatch-cost microbench: what does one jitted call cost, and
does buffer donation force a round-trip sync?

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_dispatch.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vipe_tpu.utils import jaxutil

    def sync(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timed(name, fn, reps=3):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:44s} {dt:8.1f} ms")
        return dt

    small = jnp.zeros((32, 7), jnp.float32)
    big = jnp.zeros((49, 48, 64, 48, 64), jnp.bfloat16)  # corr level-0 size

    @jax.jit
    def bump(x):
        return x + 1.0

    @functools.partial(jax.jit, donate_argnums=0)
    def bump_donated(x):
        return x + 1.0

    def chain_plain(n):
        x = small
        for _ in range(n):
            x = bump(x)
        return sync(x)

    def chain_donated(n):
        nonlocal small
        for _ in range(n):
            small = bump_donated(small)
        return sync(small)

    def chain_setrow(n):
        nonlocal small
        v = jnp.ones((7,), jnp.float32)
        for _ in range(n):
            small = jaxutil.set_row(small, 3, v)
        return sync(small)

    print("== dispatch semantics ==")
    timed("1 jitted call + sync", lambda: sync(bump(small)))
    timed("10 chained plain jit calls + sync", lambda: chain_plain(10))
    timed("10 chained donated jit calls + sync", lambda: chain_donated(10))
    timed("10 chained set_row (donated) + sync", lambda: chain_setrow(10))

    print("== big-buffer ops ==")
    perm = jnp.asarray(np.random.permutation(49), jnp.int32)

    def permute_big():
        nonlocal big
        big = jaxutil.permute_rows(big, perm)
        return sync(big[0, 0, 0, 0])

    timed("permute_rows corr-l0 (925 MB)", permute_big)

    rows = jnp.asarray([1, 2, 3, 4], jnp.int32)
    val = jnp.zeros((4, 48, 64, 48, 64), jnp.bfloat16)

    def scatter_big():
        nonlocal big
        big = jaxutil.set_rows_at(big, rows, val)
        return sync(big[0, 0, 0, 0])

    timed("set_rows_at 4 rows into corr-l0", scatter_big)

    # edge corr volume build (4 edges)
    from vipe_tpu.slam.factor_graph import _jitted_edge_corr

    fmaps = jnp.zeros((32, 48, 64, 128), jnp.bfloat16)
    ii = jnp.asarray([0, 1, 2, 3], jnp.int32)
    jj = jnp.asarray([1, 2, 3, 4], jnp.int32)
    timed("edge corr build (4 edges, 4 levels)", lambda: sync(
        _jitted_edge_corr(4, fmaps, ii, jj)[0][0, 0, 0, 0, 0]))

    # rm_factors-shaped workload: gather-for-store + 7 chained permutes
    from vipe_tpu.ops import corr as corr_ops

    ht, wd = 48, 64
    E1 = 49
    bufs = {
        "target": jnp.zeros((E1, ht, wd, 2), jnp.float32),
        "weight": jnp.zeros((E1, ht, wd, 2), jnp.float32),
        "f_net": jnp.zeros((E1, ht, wd, 128), jnp.float32),
    }
    pyr = [
        jnp.zeros((E1, ht, wd) + corr_ops.level_dims(ht, wd, l), jnp.bfloat16)
        for l in range(4)
    ]
    inac = jnp.zeros((0, ht, wd, 2), jnp.float32)
    drop_d = jnp.asarray([0, 1, 2, 3], jnp.int32)

    def rm_shaped():
        nonlocal bufs, pyr, inac
        inac = jnp.concatenate([inac[:0], bufs["target"][drop_d]], 0)
        for k in bufs:
            bufs[k] = jaxutil.permute_rows(bufs[k], perm)
        for l in range(4):
            pyr[l] = jaxutil.permute_rows(pyr[l], perm)
        return sync(bufs["target"][0, 0, 0, 0])

    timed("rm-shaped: store-gather + 7 permutes", rm_shaped)

    def perms_only():
        nonlocal bufs, pyr
        for k in bufs:
            bufs[k] = jaxutil.permute_rows(bufs[k], perm)
        for l in range(4):
            pyr[l] = jaxutil.permute_rows(pyr[l], perm)
        return sync(bufs["target"][0, 0, 0, 0])

    timed("7 chained permutes only", perms_only)


if __name__ == "__main__":
    main()
