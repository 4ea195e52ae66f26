"""Decompose the fused GRU/BA round's device cost on the TPU.

Times, each as its own jitted program with an explicit scalar-fetch sync
(block_until_ready is a no-op on axon):
  - corr volume+pyramid build (per graph build / backend chunk)
  - pyramid lookup (per GRU round)
  - DroidNet update (ConvGRU + heads + damping agg) (per round)
  - lookup+GRU together (what a fused round pays beside BA)

Usage: python scripts/profile_round.py [E]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vipe_tpu.models.droidnet import init_droidnet
    from vipe_tpu.ops import corr as corr_ops

    HT, WD = 48, 64
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    N = 32
    rng = np.random.default_rng(0)

    model, params = init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)

    fmaps = jnp.asarray(
        rng.standard_normal((N, HT, WD, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ii = jnp.asarray(rng.integers(0, N - 1, E), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1) % N, jnp.int32)
    coords = jnp.asarray(
        (rng.random((E, HT, WD, 2)) * [[WD - 2, HT - 2]]).astype(np.float32)
    )
    net = jnp.asarray(rng.standard_normal((E, HT, WD, 128)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((E, HT, WD, 128)).astype(np.float32))
    motn = jnp.zeros((E, HT, WD, 4), jnp.float32)

    def sync(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timed(name, fn, reps=5):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:40s} {dt:8.1f} ms", flush=True)
        return dt

    @jax.jit
    def build(fmaps, ii, jj):
        pyr = corr_ops.corr_pyramid(
            fmaps[ii].astype(jnp.float32), fmaps[jj].astype(jnp.float32)
        )
        return [p.astype(jnp.bfloat16) for p in pyr]

    pyr = build(fmaps, ii, jj)

    @jax.jit
    def lookup(pyr, coords):
        return corr_ops.corr_lookup_pyramid(pyr, coords)

    corr_feat = lookup(pyr, coords)

    @functools.partial(jax.jit, static_argnums=(6,))
    def gru(params, net, inp, corr, motn, ii, num):
        return model.apply(
            params, net, inp, corr, motn, ii, num,
            method=lambda m, *a: m.update(*a),
        )

    @jax.jit
    def lookup_gru(params, pyr, coords, net, inp, motn, ii):
        corr = corr_ops.corr_lookup_pyramid(pyr, coords)
        return model.apply(
            params, net, inp, corr, motn, ii, N,
            method=lambda m, *a: m.update(*a),
        )

    @jax.jit
    def build_lookup_gru(params, fmaps, ii, jj, coords, net, inp, motn):
        pyr = [
            p.astype(jnp.bfloat16)
            for p in corr_ops.corr_pyramid(
                fmaps[ii].astype(jnp.float32), fmaps[jj].astype(jnp.float32)
            )
        ]
        corr = corr_ops.corr_lookup_pyramid(pyr, coords)
        return model.apply(
            params, net, inp, corr, motn, ii, N,
            method=lambda m, *a: m.update(*a),
        )

    print(f"== E={E} edges, {HT}x{WD} grid ==")
    timed("sync-only (RTT floor)", lambda: sync(net[0, 0, 0, 0]))
    timed("corr volume+pyramid build", lambda: sync(build(fmaps, ii, jj)[0]))
    timed("pyramid lookup", lambda: sync(lookup(pyr, coords)))
    timed("GRU update", lambda: sync(
        gru(params, net, inp, corr_feat, motn, ii, N)[1]
    ))
    timed("lookup+GRU (one round w/o BA)", lambda: sync(
        lookup_gru(params, pyr, coords, net, inp, motn, ii)[1]
    ))
    timed("build+lookup+GRU (backend chunk)", lambda: sync(
        build_lookup_gru(params, fmaps, ii, jj, coords, net, inp, motn)[1]
    ))


if __name__ == "__main__":
    main()
