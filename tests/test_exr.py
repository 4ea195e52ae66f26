"""EXR depth codec tests (vipe_tpu/utils/exr.py).

The reference writes per-frame depth as fp16 EXR "Z" channels inside a zip
(/root/reference/vipe/utils/io.py:250-276) using the OpenEXR library, whose
default compression is ZIP (16-scanline blocks).  This pins:

  - our encoder/decoder round-trip (compression NONE);
  - decoding an independently synthesized OpenEXR-style ZIP-compressed file
    (the exact predictor + byte-deinterleave + zlib transform OpenEXR's
    ImfZip uses), i.e. archives written by the reference itself;
  - structural invariants of our encoder a conforming reader relies on
    (magic, version, required attributes, scanline offset table).
"""

import struct
import zipfile
import zlib

import numpy as np
import pytest

from vipe_tpu.utils import exr as E
from vipe_tpu.utils import io as io_utils


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def synth_openexr_zip(img: np.ndarray, lines_per_block: int = 16,
                      channel: str = "Z") -> bytes:
    """Emulate what OpenEXR's default writer produces: scanline file,
    ZIP compression, HALF channel."""
    img = np.asarray(img, np.float16)
    h, w = img.shape
    header = b""
    comp_id = E._C_ZIPS if lines_per_block == 1 else E._C_ZIP
    header += E._attr("channels", "chlist", E._chlist([(channel, "half")]))
    header += E._attr("compression", "compression", struct.pack("<B", comp_id))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += E._attr("dataWindow", "box2i", box)
    header += E._attr("displayWindow", "box2i", box)
    header += E._attr("lineOrder", "lineOrder", b"\0")
    header += E._attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += E._attr("screenWindowCenter", "v2f", struct.pack("<ff", 0., 0.))
    header += E._attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"
    prefix = struct.pack("<ii", E._MAGIC, 2) + header
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    blocks = []
    for b in range(n_blocks):
        y = b * lines_per_block
        raw = img[y:y + lines_per_block].tobytes()
        a = np.frombuffer(raw, np.uint8)
        half = (len(a) + 1) // 2
        inter = np.empty(len(a), np.uint8)
        inter[:half] = a[0::2]
        inter[half:] = a[1::2]
        x = inter.astype(np.int32)
        d = np.empty_like(x)
        d[0] = x[0]
        d[1:] = (x[1:] - x[:-1] + 128) & 0xFF
        comp = zlib.compress(d.astype(np.uint8).tobytes())
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y, comp))
    offs, pos = [], len(prefix) + 8 * n_blocks
    for y, c in blocks:
        offs.append(pos)
        pos += 8 + len(c)
    parts = [prefix, struct.pack("<%dQ" % n_blocks, *offs)]
    for y, c in blocks:
        parts += [struct.pack("<ii", y, len(c)), c]
    return b"".join(parts)


class TestExrCodec:
    def test_roundtrip_none_compression(self, rng):
        d = (rng.random((37, 53)) * 80).astype(np.float32)
        back = E.decode_exr(E.encode_exr(d))
        np.testing.assert_array_equal(
            back, d.astype(np.float16).astype(np.float32)
        )

    def test_reads_openexr_zip_compressed(self, rng):
        # reference-written archives use OpenEXR's default ZIP compression
        d = (rng.random((33, 48)) * 10).astype(np.float32)
        back = E.decode_exr(synth_openexr_zip(d))
        np.testing.assert_array_equal(
            back, d.astype(np.float16).astype(np.float32)
        )
        # single-line blocks (ZIPS) too
        back = E.decode_exr(synth_openexr_zip(d, lines_per_block=1))
        np.testing.assert_array_equal(
            back, d.astype(np.float16).astype(np.float32)
        )

    def test_nan_and_special_values(self):
        d = np.array([[np.nan, np.inf, 0.0, -1.5]], np.float32)
        back = E.decode_exr(E.encode_exr(d))
        assert np.isnan(back[0, 0]) and np.isinf(back[0, 1])
        np.testing.assert_array_equal(back[0, 2:], [0.0, -1.5])

    def test_encoder_structure(self, rng):
        """Structural facts a conforming OpenEXR reader depends on."""
        d = rng.random((5, 7)).astype(np.float32)
        buf = E.encode_exr(d)
        magic, version = struct.unpack_from("<ii", buf, 0)
        assert magic == 20000630 and version == 2
        attrs, pos = E._read_attrs(buf, 8)
        for req in ("channels", "compression", "dataWindow", "displayWindow",
                    "lineOrder", "pixelAspectRatio", "screenWindowCenter",
                    "screenWindowWidth"):
            assert req in attrs, req
        assert attrs["compression"][1] == b"\0"  # NONE
        assert E._parse_chlist(attrs["channels"][1]) == [("Z", 1)]  # HALF
        # offset table points at y-prefixed scanline blocks
        offs = struct.unpack_from("<5Q", buf, pos)
        for y, off in enumerate(offs):
            by, size = struct.unpack_from("<ii", buf, off)
            assert by == y and size == 7 * 2


class TestDepthZipEXR:
    def test_zip_entries_are_exr(self, tmp_path, rng):
        art = io_utils.ArtifactPath(tmp_path, "clip")
        depths = [rng.random((6, 8)).astype(np.float32) for _ in range(3)]
        io_utils.save_depth_zip(art, iter(depths))
        with zipfile.ZipFile(art.depth_path) as zf:
            names = sorted(zf.namelist())
            assert names == ["00000.exr", "00001.exr", "00002.exr"]
            assert zf.read(names[0])[:4] == b"\x76\x2f\x31\x01"

    def test_reads_reference_style_archive(self, tmp_path, rng):
        """A zip of OpenEXR-ZIP-compressed entries (what the reference's
        save_depth_artifacts produces) parses through our readers."""
        p = tmp_path / "ref.zip"
        depths = [rng.random((9, 11)).astype(np.float32) for _ in range(2)]
        with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
            for i, d in enumerate(depths):
                zf.writestr(f"{i:05d}.exr", synth_openexr_zip(d))
        back = list(io_utils.read_depth_zip(p))
        assert len(back) == 2
        np.testing.assert_array_equal(
            back[1], depths[1].astype(np.float16).astype(np.float32)
        )

    def test_legacy_npy_archive_still_reads(self, tmp_path, rng):
        import io as _io

        p = tmp_path / "old.zip"
        d = rng.random((4, 5)).astype(np.float16)
        buf = _io.BytesIO()
        np.save(buf, d)
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("00000.npy", buf.getvalue())
        back = list(io_utils.read_depth_zip(p))
        np.testing.assert_array_equal(back[0], d.astype(np.float32))
