"""Interactive viewer backend: artifact parsing, cloud unprojection, and the
HTTP API (reference vipe/utils/viser.py equivalent)."""

import json
import struct
import urllib.request

import numpy as np
import pytest

from vipe_tpu.ops import cameras as cam
from vipe_tpu.slam.interface import SLAMOutput
from vipe_tpu.utils import io as io_utils

H, W, T = 48, 64, 5


@pytest.fixture()
def artifact_dir(tmp_path):
    """Write a small artifact set directly through the IO layer."""
    art = io_utils.ArtifactPath(tmp_path, "clip")
    rng = np.random.default_rng(0)

    traj = np.zeros((T, 7), np.float32)
    traj[:, 6] = 1.0
    traj[:, 0] = np.arange(T) * 0.1
    import jax.numpy as jnp

    from vipe_tpu.ops import lie

    mats = np.asarray(lie.se3_matrix(jnp.asarray(traj)))
    io_utils.save_poses(art, traj, np.arange(T))
    io_utils.save_intrinsics(
        art, np.asarray([W * 1.2, W * 1.2, W / 2, H / 2], np.float32),
        "pinhole", n_frames=T,
    )
    writer = io_utils.StreamingArtifactWriter(art, fps=10)
    for k in range(T):
        writer.add_frame(
            rgb=rng.random((H, W, 3)).astype(np.float32),
            depth=np.full((H, W), 2.0 + 0.1 * k, np.float32),
            instance=None,
        )
    writer.close()
    return tmp_path


class TestSceneStore:
    def test_meta_and_cloud(self, artifact_dir):
        from vipe_tpu.utils.web_viewer import SceneStore

        store = SceneStore(artifact_dir)
        assert store.names() == ["clip"]
        meta = store.meta(0)
        assert meta["n_frames"] == T
        assert meta["has_depth"]
        assert len(meta["traj"]) == T * 16

        buf = store.cloud(0, 2, ssub=4)
        (n,) = struct.unpack_from("<I", buf, 0)
        assert n == (H // 4) * (W // 4)
        pts = np.frombuffer(buf, np.float32, n * 3, 4).reshape(n, 3)
        # depth-2.2 plane at identity-ish pose → z ≈ 2.2 + x offset
        np.testing.assert_allclose(pts[:, 2], 2.2, atol=1e-2)
        cols = np.frombuffer(buf, np.uint8, n * 3, 4 + n * 12)
        assert cols.shape[0] == n * 3

    def test_http_api(self, artifact_dir):
        from vipe_tpu.utils.web_viewer import serve

        httpd = serve(artifact_dir, port=0, block=False)
        try:
            port = httpd.server_address[1]

            def get(path):
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=10
                ) as r:
                    return r.read()

            page = get("/")
            assert b"vipe-tpu viewer" in page
            names = json.loads(get("/api/artifacts"))
            assert names == ["clip"]
            meta = json.loads(get("/api/scene?id=0"))
            assert meta["n_frames"] == T
            buf = get("/api/cloud?id=0&frame=0&ssub=8")
            (n,) = struct.unpack_from("<I", buf, 0)
            assert n == (H // 8) * (W // 8)
            assert len(buf) == 4 + n * 12 + n * 3
        finally:
            httpd.shutdown()
            httpd.server_close()
