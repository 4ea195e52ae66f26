"""Micro-benchmark for ba_solve at frontend/backend shapes (run on TPU).

Usage: python scripts/profile_ba.py [backend|frontend]
"""

import sys
import time

import numpy as np


def main(mode: str = "backend"):
    import jax
    import jax.numpy as jnp

    from vipe_tpu.slam import ba

    if mode == "backend":
        N, E, M, iters = 16, 256, 32, 8
    else:
        N, E, M, iters = 16, 128, 16, 4
    HT, WD = 48, 64
    P = HT * WD

    rng = np.random.default_rng(0)
    cfg = ba.BAConfig(ht=HT, wd=WD, max_edges_per_frame=M)
    ii = rng.integers(0, N - 1, E)
    jj = np.clip(ii + rng.integers(1, 3, E), 0, N - 1)
    bad = ii == jj
    jj[bad] = (ii[bad] + 1) % N
    # respect the slot budget
    counts = np.bincount(ii, minlength=N)
    while counts.max() > M:
        k = int(np.argmax(np.bincount(ii, minlength=N)))
        ii[np.where(ii == k)[0][0]] = (k + 1) % N
        counts = np.bincount(ii, minlength=N)
    slot_edge = jnp.asarray(ba.build_edge_slots(ii, jj, N, M))

    poses = jnp.broadcast_to(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (N, 7)).astype(jnp.float32)
    disps = jnp.full((N, P), 0.5)
    intr = jnp.asarray([WD * 12.0, WD * 12.0, WD * 4.0, HT * 4.0])
    target = jnp.asarray(rng.random((E, P, 2)) * 4, jnp.float32)
    weight = jnp.full((E, P, 2), 0.001)
    args = (
        cfg, poses, disps, intr, target, weight,
        jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        jnp.ones((E,), bool), slot_edge,
        jnp.ones((N,), bool).at[0].set(False), jnp.ones((N,), bool),
        jnp.full((N, P), 1e-4), jnp.zeros((N, P)), jnp.zeros((N,)),
        jnp.int32(iters), jnp.float32(1e-5), jnp.float32(1e-2),
    )
    def sync(o):
        # block_until_ready is a no-op on the axon backend; a scalar fetch
        # is the only reliable sync
        return float(np.asarray(o[0][0, 0]))

    t0 = time.perf_counter()
    out = ba.ba_solve(*args)
    sync(out)
    print(f"[{mode}] compile+first: {time.perf_counter() - t0:.2f}s")
    for k in range(3):
        t0 = time.perf_counter()
        out = ba.ba_solve(*args)
        sync(out)
        dt = time.perf_counter() - t0
        print(f"[{mode}] warm run {k}: {dt * 1000:.1f} ms "
              f"({dt / iters * 1000:.1f} ms/GN-iter, E={E}, P={P})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "backend")
