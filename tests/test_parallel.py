"""Multi-video data-parallel sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.parallel.sharding import (
    host_shard_indices,
    pvmap,
    shard_prior_batch,
    shard_videos,
    video_mesh,
)


class TestSharding:
    def test_mesh_and_placement(self):
        assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
        mesh = video_mesh(8)
        x = jnp.zeros((8, 4, 4))
        (xs,) = shard_videos(mesh, (x,))
        assert "video" in str(xs.sharding)

    def test_pvmap_per_video_independent(self, rng):
        mesh = video_mesh(8)
        x = jnp.asarray(rng.random((8, 16)), jnp.float32)
        (xs,) = shard_videos(mesh, (x,))
        f = pvmap(lambda v: v * 2.0 + jnp.sum(v), mesh)
        out = f(xs)
        want = np.asarray(x) * 2 + np.asarray(x).sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    def test_host_shard_split(self):
        a = host_shard_indices(10, 3, 0)
        b = host_shard_indices(10, 3, 1)
        c = host_shard_indices(10, 3, 2)
        assert sorted(a + b + c) == list(range(10))
        assert not (set(a) & set(b))

    def test_graft_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestTwoProcessSharding:
    def test_disjoint_shard_coverage(self, tmp_path):
        """SURVEY §4 item 5: two processes with num_shards=2 cover disjoint
        videos and together produce every artifact (host-level DCN story —
        per-video pipelines are embarrassingly parallel)."""
        import os
        import subprocess
        import sys

        import cv2

        vids = tmp_path / "vids"
        vids.mkdir()
        rng = np.random.default_rng(0)
        base = (rng.random((48 + 16, 64 + 16, 3)) * 255).astype(np.uint8)
        for name in ("a.mp4", "b.mp4"):
            w = cv2.VideoWriter(str(vids / name),
                                cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
            for k in range(8):
                w.write(base[k * 2: k * 2 + 48, k * 2: k * 2 + 64])
            w.release()
        out = tmp_path / "out"

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        # conftest already exported the CPU-fingerprinted cache dir; the
        # axon-reserved /root/.cache/jax_comp must NOT collect CPU AOT
        # entries (cross-machine loads SIGILL)
        assert "jax_comp_cpu_" in env.get("JAX_COMPILATION_CACHE_DIR", ""), \
            "expected conftest's fingerprinted CPU cache dir"
        procs = [
            subprocess.Popen(
                [sys.executable, "run.py",
                 f"streams.base_path={vids}",
                 f"pipeline.output.path={out}",
                 "pipeline.slam.resize_area=3072",
                 "pipeline.slam.warmup=4",
                 "pipeline.slam.backend_iters=1",
                 "pipeline.slam.infill_chunk_size=8",
                 "num_shards=2", f"shard_id={sid}"],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for sid in (0, 1)
        ]
        for p in procs:
            out_b, _ = p.communicate(timeout=600)
            assert p.returncode == 0, out_b.decode()[-2000:]
        from vipe_tpu.utils import io as io_utils

        names = sorted(a.name for a in io_utils.ArtifactPath.glob(out))
        assert names == ["a", "b"]


class TestPriorBatchSharding:
    def test_dav2_batch_shards_over_mesh(self, rng):
        """A vision prior runs batch-parallel over the 8-device mesh with
        per-device values identical to the unsharded forward."""
        import jax

        from vipe_tpu.priors.depth.dav2 import DepthAnythingV2Net

        net = DepthAnythingV2Net("vits", max_depth=None)
        mesh = video_mesh()
        x = jnp.asarray(rng.random((8, 70, 70, 3)), jnp.float32)

        out_sharded = shard_prior_batch(
            mesh, lambda p, b: net._forward(p, b, None), net.params, x
        )
        assert "video" in str(out_sharded.sharding)
        out_ref = net(x)
        np.testing.assert_allclose(
            np.asarray(out_sharded), np.asarray(out_ref), rtol=2e-2, atol=2e-2
        )
