"""Second-stage panorama bisect: probe_pano.py pinned the TPU worker crash
to the fused ``_jitted_extract_map`` program (every component passes
standalone).  Probe each half of the program as its own jitted dispatch to
find the miscompiled fusion:

  A. geometry half — vmapped rig compose + pano iproj + act_homog + colors
  B. filter half   — on-device mean/thresh + depth_filter + mask logic
  C. (optional, PROBE_FULL=1) the full fused program — known FAIL

Usage: JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp python scripts/probe_pano2.py
"""

import functools
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

HT, WD = 41, 73
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
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        return False


@functools.partial(jax.jit, static_argnums=(0, 1))
def _geom_half(camera_type, Nb, poses, rig_v, disps, intr_grid, images):
    ht, wd = disps.shape[-2:]
    u, v = geom.pixel_grid(ht, wd)
    poses = jax.vmap(lambda p: lie.se3_mul(lie.se3_inv(rig_v), p))(poses)
    c2w = lie.se3_inv(poses)
    pts_local = cam.iproj_disp(
        camera_type, intr_grid,
        jnp.broadcast_to(u, disps.shape), jnp.broadcast_to(v, disps.shape),
        disps,
    )
    pts_world = geom.act_homog(c2w[:, None, None, :], pts_local)
    xyz = pts_world[..., :3] / jnp.maximum(pts_world[..., 3:], 1e-8)
    colors = images[:, 3::8, 3::8, :].astype(jnp.float32) / 255.0
    return xyz, colors


@functools.partial(jax.jit, static_argnums=(0,))
def _filter_half(Nb, poses, rig_v, disps, pin, masks, filter_thresh, n):
    ht, wd = disps.shape[-2:]
    poses = jax.vmap(lambda p: lie.se3_mul(lie.se3_inv(rig_v), p))(poses)
    valid_row = (jnp.arange(Nb) < n)[:, None, None]
    mean_disp = jnp.sum(jnp.where(valid_row, disps, 0.0)) / jnp.maximum(
        jnp.sum(valid_row) * ht * wd, 1
    )
    thresh_v = filter_thresh / jnp.maximum(mean_disp, 1e-8)
    counts = geom.depth_filter(
        poses, disps, pin, jnp.arange(Nb),
        jnp.broadcast_to(thresh_v, (Nb,)), num_valid=n,
    )
    per_frame_mean = jnp.mean(disps, axis=(1, 2), keepdims=True)
    mask = (
        (counts >= jnp.minimum(2, n - 1))
        & (disps > 0.5 * per_frame_mean)
        & (~masks)
    )
    return mask


def main():
    rng = np.random.default_rng(0)
    intr = jnp.asarray(cam.panorama_intrinsics(HT, WD), jnp.float32)
    poses = jnp.asarray(
        np.concatenate(
            [0.05 * rng.normal(size=(N, 3)), np.tile([0, 0, 0, 1.0], (N, 1))],
            -1,
        ), jnp.float32,
    )
    disps = jnp.asarray(0.5 + 0.1 * rng.random((N, HT, WD)), jnp.float32)
    pin = cam.pinhole_equivalent(cam.CameraType.PANORAMA, intr) / 8.0
    rig = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32)
    images = jnp.zeros((N, HT * 8, WD * 8, 3), jnp.uint8)
    masks = jnp.zeros((N, HT, WD), bool)

    stage("A geom half (pano iproj + colors)", lambda: _geom_half(
        cam.CameraType.PANORAMA, N, poses, rig, disps, intr, images
    )[0])
    stage("B filter half (thresh + depth_filter + mask)", lambda: _filter_half(
        N, poses, rig, disps, pin, masks, jnp.float32(0.05), jnp.int32(N)
    ))
    if os.environ.get("PROBE_FULL") == "1":
        from vipe_tpu.slam.buffer import _jitted_extract_map

        stage("C full fused extract (known fail)", lambda: _jitted_extract_map(
            cam.CameraType.PANORAMA, N, poses, rig, disps, intr, pin,
            masks, images, jnp.float32(0.05), jnp.int32(N),
        )[0])
    print("probe2 done", flush=True)


if __name__ == "__main__":
    main()
