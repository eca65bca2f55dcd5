"""ANN recall vs brute force + multimodal plumbing."""

import numpy as np
import pytest


def test_ann_recall_vs_bruteforce(ray_session, sf_dir):
    from crawler_ray.pipelines.queries import q_knn_bruteforce
    from crawler_ray.stages.ann import ann_query

    exact = {}
    for r in q_knn_bruteforce(sf_dir).take_all():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ann_query(sf_dir).take_all():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == len(exact)
    assert float(np.mean(recalls)) >= 0.6, recalls


def test_ivf_recall_vs_bruteforce(ray_session, sf_dir):
    from crawler_ray.pipelines.queries import q_knn_bruteforce
    from crawler_ray.stages.ann import ivf_query

    exact = {}
    for r in q_knn_bruteforce(sf_dir).take_all():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ivf_query(sf_dir).take_all():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert float(np.mean(recalls)) >= 0.5, recalls


def test_ann_deterministic(ray_session, sf_dir):
    from crawler_ray.stages.ann import ann_query

    a = sorted(map(tuple, (r.values() for r in ann_query(sf_dir).take_all())))
    b = sorted(map(tuple, (r.values() for r in ann_query(sf_dir).take_all())))
    assert a == b


def test_media_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.media import (
        MediaCodecUnavailable, MediaDecodeStage, media_rows_from_spans,
        synth_payload,
    )

    spans = [
        [{"kind": "media", "text": "", "media_ref": f"https://h/media/{i}.png",
          "offset": 0},
         {"kind": "text", "text": "x", "media_ref": "", "offset": 1}]
        for i in range(10)
    ]
    pages = pa.table({"spans": pa.array(spans)})
    media = media_rows_from_spans(pages)
    assert media.num_rows == 10
    # payloads are now REAL PNG bytes (size varies with content)
    from crawler_ray.functions.png import decode_png_gray

    assert media["n_bytes"].to_pylist() == [
        len(p) for p in media["payload"].to_pylist()
    ]
    assert decode_png_gray(media["payload"].to_pylist()[0]).shape == (48, 64)
    # deterministic payloads
    assert synth_payload("a") == synth_payload("a") != synth_payload("b")

    decoded = (
        rd.from_arrow(media)
        .map_batches(
            MediaDecodeStage,
            fn_constructor_kwargs={"codec": "synth"},
            batch_size=4,
            concurrency=2,
            num_cpus=1,
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert len(decoded) == 10
    assert len(decoded[0]["thumb"]) == 64  # 8x8
    assert len(decoded[0]["features"]) == 16
    assert "payload" not in decoded[0]  # wide column dropped after decode

    with pytest.raises(MediaCodecUnavailable):
        MediaDecodeStage(codec="pil")


def test_video_container_roundtrip():
    from crawler_ray.stages.media import (
        split_video_frames,
        video_payload,
    )

    p = video_payload("m://host/vid7")
    frames = split_video_frames(p)
    assert 1 <= len(frames) <= 24
    # frames are real PNGs, each decodable and distinct
    from crawler_ray.functions.png import decode_png_gray

    imgs = [decode_png_gray(f) for f in frames]
    assert all(i.shape == (24, 32) for i in imgs)
    if len(imgs) > 1:
        assert not (imgs[0] == imgs[1]).all()


def test_sample_frame_indices_uniform():
    from crawler_ray.stages.media import sample_frame_indices

    assert sample_frame_indices(3, 4) == [0, 1, 2]
    assert sample_frame_indices(4, 4) == [0, 1, 2, 3]
    assert sample_frame_indices(10, 4) == [0, 2, 5, 7]
    idx = sample_frame_indices(24, 4)
    assert idx == sorted(set(idx)) and len(idx) == 4


def test_frame_sample_stage_rows(ray_session):
    import pyarrow as pa

    from crawler_ray.stages.media import (
        FrameSampleStage,
        sample_frame_indices,
        split_video_frames,
        video_payload,
    )

    refs = [f"m://h/{i}" for i in range(6)]
    payloads = [video_payload(r) for r in refs]
    t = pa.table({"media_ref": refs,
                  "payload": pa.array(payloads, type=pa.binary())})
    out = FrameSampleStage(k=4)(t)
    # one row per sampled frame, indices exactly the deterministic sample
    got = {}
    for ref, n, idx in zip(out["media_ref"].to_pylist(),
                           out["n_frames"].to_pylist(),
                           out["frame_idx"].to_pylist()):
        got.setdefault(ref, (n, []))[1].append(idx)
    for r, p in zip(refs, payloads):
        n = len(split_video_frames(p))
        assert got[r][0] == n
        assert got[r][1] == sample_frame_indices(n, 4)
    # thumbs are 8x8 decoded content
    assert all(len(x) == 64 for x in out["thumb"].to_pylist())


def test_wav_roundtrip_and_features():
    import numpy as np

    from crawler_ray.stages.media import (
        AudioFeatureStage,
        decode_wav,
        wav_payload,
    )

    p = wav_payload("m://h/a1")
    x, rate = decode_wav(p)
    assert rate == 8000 and 1000 <= len(x) <= 5000 and x.dtype == np.int16
    n, dur, zc, peak, energy = AudioFeatureStage._features_one(p)
    assert n == len(x)
    assert dur == n * 1000 // rate
    assert 0 < zc < n
    assert 0 < peak <= 32768
    assert energy == int((x.astype(np.int64) ** 2).sum())
    # deterministic
    assert wav_payload("m://h/a1") == p
    assert wav_payload("m://h/a2") != p


def test_audio_stage_batch(ray_session):
    import pyarrow as pa

    from crawler_ray.stages.media import AudioFeatureStage, wav_payload

    refs = [f"m://h/{i}" for i in range(4)]
    t = pa.table({
        "media_ref": refs,
        "kind": ["audio"] * 4,
        "n_bytes": [0] * 4,
        "payload": pa.array([wav_payload(r) for r in refs], type=pa.binary()),
    })
    out = AudioFeatureStage()(t)
    assert out.num_rows == 4
    assert "payload" not in out.column_names
    assert all(v > 0 for v in out["energy"].to_pylist())


def test_ahash_kernel_properties():
    """aHash: vectorized threshold+pack matches a per-image reference;
    constant images hash to all-zero bits (no pixel exceeds the mean)."""
    import numpy as np

    from crawler_ray.stages.media import ahash_hex

    rng = np.random.default_rng(11)
    thumbs = rng.integers(0, 256, size=(17, 64), dtype=np.uint8)
    got = ahash_hex(thumbs)
    for i in range(len(thumbs)):
        bits = (thumbs[i] > thumbs[i].mean()).astype(np.uint8)
        exp = np.packbits(bits).tobytes().hex()
        assert got[i] == exp
    flat = np.full((1, 64), 77, dtype=np.uint8)
    assert ahash_hex(flat)[0] == "0" * 16
    assert len(ahash_hex(np.empty((0, 64), dtype=np.uint8))) == 0


def test_content_key_reduces_cardinality_deterministically():
    from crawler_ray.stages.media import content_key

    refs = [f"img://host/{i}" for i in range(200)]
    keys = {content_key(r) for r in refs}
    assert 1 < len(keys) <= 12
    assert all(content_key(r) == content_key(r) for r in refs[:5])
