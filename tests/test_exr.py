"""Pure-Python EXR codec tests (data/exr.py): writer<->reader roundtrip,
HALF-channel ZIP decoding (the layout real InteriorVerse/Hypersim files
use), and the cv2-less image_io fallback path."""

import struct
import zlib

import numpy as np
import pytest

from marigold_tpu.data.exr import ExrError, read_exr, write_exr


def _interleave_predict(raw: bytes) -> bytes:
    """Forward ZIP reorder (inverse of exr._unpredict_deinterleave)."""
    arr = np.frombuffer(raw, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    two = np.empty(n, np.uint8)
    two[:half] = arr[0::2]
    two[half:] = arr[1::2]
    d = two.astype(np.int16)
    d[1:] = (d[1:] - d[:-1].astype(np.int16)) + 128
    return d.astype(np.uint8).tobytes()


def _encode_exr_zip_half(arr: np.ndarray) -> bytes:
    """Reference-layout encoder the writer doesn't cover: HALF channels,
    ZIP compression (16-scanline blocks) — what production EXRs look like."""
    h, w, _ = arr.shape
    half = arr.astype(np.float16)
    names = ["B", "G", "R"]
    src = {"B": 2, "G": 1, "R": 0}

    def attr(name, typ, payload):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(payload)) + payload)

    chlist = b""
    for cn in names:
        chlist += (cn.encode() + b"\0" + struct.pack("<i", 1)  # HALF
                   + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chlist += b"\0"
    header = (
        attr("channels", "chlist", chlist)
        + attr("compression", "compression", b"\x03")  # ZIP
        + attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
        + attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
        + attr("lineOrder", "lineOrder", b"\0")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )
    blocks = []
    for y0 in range(0, h, 16):
        n_lines = min(16, h - y0)
        raw = b""
        for line in range(n_lines):
            for cn in names:
                raw += half[y0 + line, :, src[cn]].tobytes()
        comp = zlib.compress(_interleave_predict(raw))
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y0, comp))
    pre = struct.pack("<ii", 20000630, 2)
    start = len(pre) + len(header) + 8 * len(blocks)
    offsets, cur = [], start
    for _, c in blocks:
        offsets.append(cur)
        cur += 8 + len(c)
    out = pre + header + struct.pack(f"<{len(blocks)}Q", *offsets)
    for y0, c in blocks:
        out += struct.pack("<ii", y0, len(c)) + c
    return out


def test_write_read_roundtrip_rgb(tmp_path, rng):
    a = rng.uniform(0, 4, (13, 17, 3)).astype(np.float32)
    p = str(tmp_path / "a.exr")
    write_exr(p, a)
    b = read_exr(open(p, "rb").read())
    np.testing.assert_array_equal(a, b)


def test_write_read_roundtrip_gray(tmp_path, rng):
    g = rng.uniform(0, 1, (9, 11)).astype(np.float32)
    p = str(tmp_path / "g.exr")
    write_exr(p, g)
    h = read_exr(open(p, "rb").read())
    assert h.shape == (9, 11)
    np.testing.assert_array_equal(g, h)


def test_zip_half_decoding(rng):
    # 37 rows -> 3 blocks (16+16+5): exercises full and partial ZIP blocks
    a = rng.uniform(0, 2, (37, 23, 3)).astype(np.float32)
    data = _encode_exr_zip_half(a)
    b = read_exr(data)
    np.testing.assert_allclose(a.astype(np.float16).astype(np.float32), b)


def test_image_io_fallback(tmp_path, rng):
    """decode_image_bytes must decode EXR even when cv2 lacks OpenEXR
    (this environment's cv2 reports `OpenEXR: NO`)."""
    from marigold_tpu.data.image_io import read_img_from_file

    a = rng.uniform(0, 0.9, (8, 10, 3)).astype(np.float32)
    p = str(tmp_path / "x.exr")
    write_exr(p, a)
    img = read_img_from_file(p)
    np.testing.assert_allclose(img, a, atol=1e-6)


def test_unsupported_compression_raises():
    # PIZ (id 4) is out of scope; the error must be explicit, not a crash
    a = np.zeros((4, 4, 3), np.float32)
    data = bytearray(_encode_exr_zip_half(a))
    i = bytes(data).index(b"compression\0compression\0")
    # attribute value byte follows name, type, int32 size
    off = i + len(b"compression\0compression\0") + 4
    data[off] = 4
    with pytest.raises(ExrError, match="compression"):
        read_exr(bytes(data))


def test_bad_magic_raises():
    with pytest.raises(ExrError, match="magic"):
        read_exr(b"nonsense-bytes")


def test_version_flag_bits():
    """Version-field flags (OpenEXRFileLayout): bit 12 = multi-part,
    bit 9 = tiled, bit 11 = deep. A multi-part file must be rejected as
    such — its header would otherwise be misparsed as a single-part one
    (part 2's header read as the offset table)."""
    a = np.zeros((4, 4, 3), np.float32)
    base = _encode_exr_zip_half(a)

    def with_version(v):
        d = bytearray(base)
        struct.pack_into("<i", d, 4, v)
        return bytes(d)

    with pytest.raises(ExrError, match="multi-part"):
        read_exr(with_version(2 | 0x1000))
    with pytest.raises(ExrError, match="tiled"):
        read_exr(with_version(2 | 0x200))
    with pytest.raises(ExrError, match="deep"):
        read_exr(with_version(2 | 0x800))
    with pytest.raises(ExrError, match="version"):
        read_exr(with_version(3))
