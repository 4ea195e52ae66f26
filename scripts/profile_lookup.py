"""Compare corr-lookup formulations on the TPU.

Variants, each its own jitted program, synced by scalar fetch:
  a) selection-matrix einsum (current corr_lookup) on bf16 volumes
  b) same, f32 volumes (dtype traffic check)
  c) one-shot combined 49-tap one-hot over flattened target (single einsum)
  d) take_along_axis gather on the flattened volume

Usage: python scripts/profile_lookup.py [E]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vipe_tpu.ops import corr as corr_ops

    HT, WD = 48, 64
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    R = 3
    K = 2 * R + 1
    rng = np.random.default_rng(0)

    # build the ~1 GB volume ON DEVICE from small feature uploads — pushing
    # a host-materialized volume through the ~30 MB/s tunnel takes ~an hour
    f1 = jnp.asarray(rng.standard_normal((E, HT, WD, 128)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((E, HT, WD, 128)).astype(np.float32))
    vol = jax.jit(corr_ops.corr_volume)(f1, f2).astype(jnp.bfloat16)
    coords = jnp.asarray(
        (rng.random((E, HT, WD, 2)) * [[WD - 2, HT - 2]]).astype(np.float32)
    )

    def sync(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timed(name, fn, reps=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:44s} {dt:8.1f} ms", flush=True)
        return dt

    lookup_a = jax.jit(lambda v, c: corr_ops.corr_lookup(v, c, R))
    vol32 = vol.astype(jnp.float32)

    @jax.jit
    def lookup_c(vol, coords):
        # combined (2r+1)² one-hot over the flattened target plane with the
        # 4-corner bilinear weights folded in: one einsum, one big W
        Ev, h1, w1, h2, w2 = vol.shape
        u = coords[..., 0]
        v = coords[..., 1]
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        du = (u - u0)[..., None, None]
        dv = (v - v0)[..., None, None]
        offs = jnp.arange(K) - R
        zi = v0.astype(jnp.int32)[..., None, None] + offs[:, None]
        xi = u0.astype(jnp.int32)[..., None, None] + offs[None, :]
        P = h1 * w1
        Z = h2 * w2
        flat = (zi * w2 + xi).reshape(Ev, P, K * K)
        grid = jnp.arange(Z)
        w00 = ((1 - dv) * (1 - du)).reshape(Ev, P, 1, 1)
        w01 = ((1 - dv) * du).reshape(Ev, P, 1, 1)
        w10 = (dv * (1 - du)).reshape(Ev, P, 1, 1)
        w11 = (dv * du).reshape(Ev, P, 1, 1)
        ok = ((zi >= 0) & (zi < h2) & (xi >= 0) & (xi < w2)).reshape(
            Ev, P, K * K, 1)
        f = flat[..., None]
        W = (
            w00 * (f == grid) + w01 * ((f + 1) == grid)
            + w10 * ((f + w2) == grid) + w11 * ((f + w2 + 1) == grid)
        )
        W = jnp.where(ok, W, 0.0).astype(vol.dtype)
        out = jnp.einsum(
            "epkz,epz->epk", W, vol.reshape(Ev, P, Z),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(Ev, h1, w1, K * K)

    @jax.jit
    def lookup_d(vol, coords):
        Ev, h1, w1, h2, w2 = vol.shape
        u = coords[..., 0]
        v = coords[..., 1]
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        du = (u - u0)[..., None, None]
        dv = (v - v0)[..., None, None]
        offs = jnp.arange(K + 1) - R
        zi = v0.astype(jnp.int32)[..., None, None] + offs[:, None]
        xi = u0.astype(jnp.int32)[..., None, None] + offs[None, :]
        ok = (zi >= 0) & (zi < h2) & (xi >= 0) & (xi < w2)
        ziC = jnp.clip(zi, 0, h2 - 1)
        xiC = jnp.clip(xi, 0, w2 - 1)
        P = h1 * w1
        flat = (ziC * w2 + xiC).reshape(Ev, P, (K + 1) * (K + 1))
        vals = jnp.take_along_axis(
            vol.reshape(Ev, P, h2 * w2), flat, axis=2
        ).reshape(Ev, h1, w1, K + 1, K + 1).astype(jnp.float32)
        vals = jnp.where(ok, vals, 0.0)
        out = (
            (1 - dv) * (1 - du) * vals[..., :-1, :-1]
            + (1 - dv) * du * vals[..., :-1, 1:]
            + dv * (1 - du) * vals[..., 1:, :-1]
            + dv * du * vals[..., 1:, 1:]
        )
        return out.reshape(Ev, h1, w1, K * K)

    del lookup_c  # (E,P,49,Z) one-hot = ~44 GB materialized: infeasible
    want = np.asarray(lookup_a(vol, coords))
    got = np.asarray(lookup_d(vol, coords))
    print(f"variant d max err vs a: {np.abs(got - want).max():.4f}")

    print(f"== E={E} edges, {HT}x{WD}, level-0 lookup ==")
    timed("sync-only (RTT floor)", lambda: sync(coords))
    timed("a) selection einsum, bf16 vol", lambda: sync(lookup_a(vol, coords)))
    timed("b) selection einsum, f32 vol", lambda: sync(lookup_a(vol32, coords)))
    timed("d) take_along_axis gather", lambda: sync(lookup_d(vol, coords)))

    # full 4-level pyramid: XLA per-level einsum vs fused Pallas kernel
    from vipe_tpu.ops.pallas_corr import corr_lookup_pyramid_pallas

    pyr = [p.astype(jnp.bfloat16)
           for p in jax.jit(corr_ops.corr_pyramid)(f1, f2)]
    look_xla = jax.jit(lambda p, c: corr_ops.corr_lookup_pyramid(p, c, R))
    want = np.asarray(look_xla(pyr, coords))
    got = np.asarray(corr_lookup_pyramid_pallas(pyr, coords, radius=R))
    print(f"pallas max err vs xla pyramid: {np.abs(got - want).max():.4f}")
    print(f"== 4-level pyramid lookup ==")
    timed("e) XLA per-level einsum pyramid",
          lambda: sync(look_xla(pyr, coords)))
    timed("f) Pallas fused pyramid kernel",
          lambda: sync(corr_lookup_pyramid_pallas(pyr, coords, radius=R)))

    # altcorr-style: volume built in VMEM per block, never in HBM.
    # Includes the per-round volume rebuild cost — compare (f) + the
    # amortized corr_pyramid build vs (g) alone.
    from vipe_tpu.ops.pallas_corr import corr_fused_pallas

    pools = [f2]
    for _ in range(3):
        pools.append(corr_ops.avg_pool2_nhwc(pools[-1]))
    got_g = np.asarray(corr_fused_pallas(f1, pools, coords, radius=R))
    print(f"fused-altcorr max err vs xla pyramid: "
          f"{np.abs(got_g - want).max():.4f}")
    timed("g) Pallas fused build+lookup (altcorr)",
          lambda: sync(corr_fused_pallas(f1, pools, coords, radius=R)))
    build = jax.jit(corr_ops.corr_pyramid)
    timed("h) corr_pyramid build alone",
          lambda: sync(build(f1, f2)[0]))


if __name__ == "__main__":
    main()
