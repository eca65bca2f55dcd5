"""Real stdlib PNG codec: spec structure, CRC validation, all five filter
reconstructions, and the media decode stage end-to-end on genuine PNGs."""

import struct
import zlib

import numpy as np
import pytest

from crawler_ray.functions.png import (
    _chunk,
    _SIGNATURE,
    decode_png_gray,
    encode_png_gray,
    synth_image,
)


def test_roundtrip_all_encoder_filters():
    img = synth_image("roundtrip", 37, 53)
    for ft in (0, 1, 2):
        data = encode_png_gray(img, filter_type=ft)
        assert data[:8] == _SIGNATURE
        out = decode_png_gray(data)
        assert np.array_equal(out, img)


def test_decoder_reconstructs_average_and_paeth():
    """Hand-build IDAT scanlines with filters 3 (Average) and 4 (Paeth) —
    our encoder never emits them, but real-world PNGs do."""
    img = synth_image("filters", 6, 8)
    h, w = img.shape
    rows = []
    for y in range(h):
        row = img[y].astype(int)
        prev = img[y - 1].astype(int) if y else np.zeros(w, dtype=int)
        ft = 3 if y % 2 == 0 else 4
        filt = np.zeros(w, dtype=np.uint8)
        for x in range(w):
            left = int(img[y, x - 1]) if x else 0
            up = int(prev[x])
            ul = int(img[y - 1, x - 1]) if (x and y) else 0
            if ft == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
            filt[x] = (row[x] - pred) & 0xFF
        rows.append(bytes([ft]) + filt.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png_gray(data), img)


def test_crc_tamper_detected():
    data = bytearray(encode_png_gray(synth_image("crc", 8, 8)))
    data[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(data))


def test_non_png_and_unsupported_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"GIF89a....")
    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    data = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="grayscale"):
        decode_png_gray(data)


def test_media_decode_stage_on_real_pngs(ray_session):
    import pyarrow as pa

    from crawler_ray.stages.media import MediaDecodeStage, png_payload

    refs = [f"https://h/media/doc{i}.png" for i in range(6)]
    batch = pa.table(
        {
            "media_ref": pa.array(refs),
            "kind": pa.array(["image"] * 6),
            "payload": pa.array([png_payload(r) for r in refs], type=pa.binary()),
            "n_bytes": pa.array([1] * 6, type=pa.int64()),
        }
    )
    stage = MediaDecodeStage(codec="png", target_size=(8, 8))
    out = stage(batch)
    assert out["img_h"].to_pylist() == [48] * 6
    assert out["img_w"].to_pylist() == [64] * 6
    assert all(len(t) == 64 for t in out["thumb"].to_pylist())
    feats = out["features"].to_pylist()
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in feats)  # histogram sums to 1
    # deterministic: same ref -> same features; distinct refs -> differ
    out2 = stage(batch)
    assert out2["features"].to_pylist() == feats
    assert feats[0] != feats[1]
