"""Bisect the panorama TPU kernel fault (BENCH_CAMERA=panorama crashed the
worker at the extract_slam_map readback — the fault is async, so the
suspects are every program enqueued after the last successful sync: the
fused filler rounds and ``_jitted_extract_map``).

Runs each panorama-specific program standalone on the chip with a scalar
sync between, smallest first, and prints PASS/FAIL per stage.  Usage:

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp python scripts/probe_pano.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vipe_tpu.ops import cameras as cam
from vipe_tpu.ops import geom, lie

HT, WD = 41, 73          # pano bench operating grid (matches 720p resize)
N = 16


def sync(x):
    return float(np.asarray(x).reshape(-1)[0])


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        v = fn()
        sync(v)
        print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    # pixel-unit equirect intrinsics as SLAMSystem sets them for panorama
    intr = jnp.asarray(
        cam.panorama_grid_intrinsics(HT, WD)
        if hasattr(cam, "panorama_grid_intrinsics")
        else [WD / (2 * np.pi), HT / np.pi, WD / 2, HT / 2],
        jnp.float32,
    )
    poses = jnp.asarray(
        np.concatenate(
            [0.05 * rng.normal(size=(N, 3)),
             np.tile([0, 0, 0, 1.0], (N, 1))], -1
        ), jnp.float32,
    )
    disps = jnp.asarray(
        0.5 + 0.1 * rng.random((N, HT, WD)), jnp.float32
    )
    u, v = geom.pixel_grid(HT, WD)

    stage("iproj_disp pano", lambda: cam.iproj_disp(
        cam.CameraType.PANORAMA, intr,
        jnp.broadcast_to(u, disps.shape), jnp.broadcast_to(v, disps.shape),
        disps,
    ))

    ii = jnp.asarray(np.repeat(np.arange(N - 1), 1), jnp.int32)
    jj = ii + 1
    stage("reproject pano", lambda: geom.reproject(
        poses, disps, intr, cam.CameraType.PANORAMA, ii, jj
    )[0])

    pin = cam.pinhole_equivalent(cam.CameraType.PANORAMA, intr)
    rig0 = jnp.asarray([[0, 0, 0, 0, 0, 0, 1.0]], jnp.float32)
    stage("frame_distance_mv (pinhole-equivalent)",
          lambda: geom.frame_distance_mv(
              poses, rig0, disps.reshape(N, HT, WD), pin[None], ii,
              jnp.zeros_like(ii), ii, jj, jnp.zeros_like(jj), beta=0.3))
    stage("depth_filter pinhole-equivalent", lambda: geom.depth_filter(
        poses, disps, pin / 1.0, jnp.arange(N),
        jnp.full((N,), 0.1, jnp.float32), num_valid=N,
    ))

    from vipe_tpu.slam.buffer import _jitted_extract_map

    images = jnp.zeros((N, HT * 8, WD * 8, 3), jnp.uint8)
    masks = jnp.zeros((N, HT, WD), bool)
    rig = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32)
    stage("_jitted_extract_map pano", lambda: _jitted_extract_map(
        cam.CameraType.PANORAMA, N, poses, rig, disps, intr, pin / 8.0,
        masks, images, jnp.float32(0.05), jnp.int32(N),
    )[0])

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
