"""Frontend phase microbench on the TPU: times each per-keyframe phase with
explicit syncs (scalar fetch — block_until_ready is a no-op on axon).

Usage: python scripts/profile_frontend.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from vipe_tpu.models.droidnet import init_droidnet
    from vipe_tpu.slam.buffer import GraphBuffer
    from vipe_tpu.slam.factor_graph import FactorGraph
    from vipe_tpu.slam.system import make_droidnet_fns

    H, W = 384, 512
    HT, WD = H // 8, W // 8
    N = 18

    model, params = init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)
    ef, ec, uf = make_droidnet_fns(model)
    rng = np.random.default_rng(0)
    buf = GraphBuffer(height=H, width=W, buffer_size=32)

    def timed(name, fn, reps=3):
        fn()  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:32s} {dt:8.1f} ms")
        return dt

    # fill the buffer
    img8 = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
    fmap = ef(params, img8[None])[0]
    net, inp = ec(params, img8[None])
    for k in range(N):
        buf.append_keyframe(k, img8, fmap, net[0], inp[0],
                            intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32))
        buf.poses = buf.poses.at[k, 0].set(0.05 * k)

    print("== per-frame ==")
    timed("encode_features", lambda: sync(ef(params, img8[None])))
    timed("encode_context", lambda: sync(ec(params, img8[None])[0]))
    timed("upload 512x384 uint8", lambda: sync(
        jnp.asarray(np.zeros((H, W, 3), np.uint8))))

    g = FactorGraph(buf, uf, params, max_factors=48, incremental=True)
    g.add_neighborhood_factors(0, N, r=2)
    print(f"edges: {g.n_edges}")

    print("== per-keyframe phases ==")
    timed("distance matrix submit+read", lambda: float(np.asarray(
        g.submit_distance_matrix(beta=0.25)[2])[0, 1]))

    def add_rm():
        mask = np.zeros(g.n_edges, bool)
        mask[:4] = True
        g.rm_factors(mask, store=True)
        es = np.stack([np.arange(4), np.arange(4) + 2], -1)
        g.add_factors(es[:, 0], es[:, 1])
        return sync(g.target[0, 0, 0, 0])

    timed("rm(4)+add(4) factors", add_rm)

    def rm_only():
        mask = np.zeros(g.n_edges, bool)
        mask[:4] = True
        ii4, jj4 = g.ii[:4].copy(), g.jj[:4].copy()
        g.rm_factors(mask, store=True)
        g.add_factors(ii4, jj4)  # restore for next rep (not timed separately)
        return sync(g.target[0, 0, 0, 0])

    class T:
        rm = add = 0.0

    def split_rm_add():
        mask = np.zeros(g.n_edges, bool)
        mask[:4] = True
        ii4, jj4 = g.ii[:4].copy(), g.jj[:4].copy()
        t0 = time.perf_counter()
        g.rm_factors(mask, store=True)
        sync(g.target[0, 0, 0, 0])
        T.rm += time.perf_counter() - t0
        t0 = time.perf_counter()
        g.add_factors(ii4, jj4)
        sync(g.target[0, 0, 0, 0])
        T.add += time.perf_counter() - t0

    split_rm_add()  # warm
    T.rm = T.add = 0.0
    for _ in range(3):
        split_rm_add()
    print(f"{'  rm_factors(4) alone':32s} {T.rm / 3 * 1000:8.1f} ms")
    print(f"{'  add_factors(4) alone':32s} {T.add / 3 * 1000:8.1f} ms")

    timed("update x1 (GRU+BA3)", lambda: (g.update(use_inactive=True),
                                          sync(buf.poses[0]))[1])
    timed("update_fused x4", lambda: (g.update_fused(4, use_inactive=True),
                                      sync(buf.poses[0]))[1])
    timed("update_fused x2", lambda: (g.update_fused(2, use_inactive=True),
                                      sync(buf.poses[0]))[1])
    timed("frame_distance pair + read", lambda: float(jnp.max(
        buf.frame_distance(jnp.asarray([N - 3]), jnp.asarray([N - 2]),
                           beta=0.3, bidirectional=True))))
    timed("scalar readback", lambda: sync(buf.poses[0]))


if __name__ == "__main__":
    main()
