"""Multimodal columns: typed binary payloads + actor-pool decode stages.

The reference stores raw HTML and extracted documents as GCS blobs keyed
from the page row (``/root/reference/crawler/services/storage.py:16-104``,
``gcs_documents`` JSONB on crawled_page).  At 100 TB training-data scale the
same shape generalizes to image/audio/video payloads: an opaque ``binary``
column plus typed metadata, processed by actor-pool ``map_batches`` stages.

PIL/ffmpeg are NOT in this container, but PNG needs only stdlib zlib — so
the pipeline carries REAL spec-conformant PNG bytes end-to-end
(:mod:`crawler_ray.functions.png`): payloads are genuine encoded images and
``codec="png"`` performs an actual decode (chunk walk, CRC checks, filter
reconstruction).  ``codec="pil"``/``"ffmpeg"`` still raise
``MediaCodecUnavailable`` (JPEG/video need external libraries); the
``"synth"`` keystream codec remains for plumbing tests:

- media rows: (media_ref, kind, payload: binary, width/height/duration
  metadata);
- :class:`MediaDecodeStage`: callable class for ``map_batches(...,
  concurrency=N, num_cpus=c)`` — codec state built once per actor;
- :func:`synth_payload` generates deterministic fake payloads from a
  media_ref (sandbox stand-in for blob storage / fetch);
- batch sizing guidance: payloads are wide — callers pass small
  ``batch_size`` (e.g. 16-64) so batch x concurrency fits worker heap
  (SURVEY.md §7.4 wide-rows note).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


class MediaCodecUnavailable(NotImplementedError):
    """Raised when a real codec (PIL/ffmpeg/torchaudio) is required but not
    installed in this environment."""


def synth_payload(media_ref: str, n_bytes: int = 4096) -> bytes:
    """Deterministic fake payload: sha256 keystream of the media_ref."""
    out = bytearray()
    counter = 0
    seed = media_ref.encode()
    while len(out) < n_bytes:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n_bytes])


def png_payload(media_ref: str, h: int = 48, w: int = 64) -> bytes:
    """Deterministic REAL PNG payload (stdlib codec) keyed by media_ref —
    the sandbox stand-in for fetching the image blob."""
    from crawler_ray.functions.png import encode_png_gray, synth_image

    return encode_png_gray(synth_image(media_ref, h, w))


def _media_refs(batch: pa.Table) -> list:
    """Extract every media span's ref from a pages(spans) batch, in span
    order — the shared front half of every *_rows_from_spans builder."""
    refs = []
    for spans in batch["spans"].to_pylist():
        for s in spans or []:
            if s["kind"] == "media" and s["media_ref"]:
                refs.append(s["media_ref"])
    return refs


def _media_table(refs: list, payloads: list, kind: str) -> pa.Table:
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "kind": pa.array([kind] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


def media_rows_from_spans(batch: pa.Table, payload_bytes: int = 4096,
                          payload_codec: str = "png") -> pa.Table:
    """pages(spans) -> media table rows (one per media span), payload
    "fetched" via the deterministic blob store (real PNG bytes by
    default)."""
    refs = _media_refs(batch)
    if payload_codec == "png":
        payloads = [png_payload(r) for r in refs]
    else:
        payloads = [synth_payload(r, payload_bytes) for r in refs]
    return _media_table(refs, payloads, "image")


def content_key(media_ref: str, n_variants: int = 12) -> str:
    """Reduced-cardinality content key: the deterministic stand-in for a
    web where many pages embed the SAME image under different URLs — the
    duplication shape perceptual-hash dedup exists for.  md5-keyed so the
    golden replay reproduces it exactly."""
    v = int.from_bytes(
        hashlib.md5(media_ref.encode()).digest()[:4], "big"
    ) % n_variants
    return f"img://content/{v}"


def media_rows_shared_content(batch: pa.Table, n_variants: int = 12) -> pa.Table:
    """pages(spans) -> media rows whose payloads are fetched by CONTENT
    key (many refs -> one image), keeping the original media_ref column —
    the input shape for image near-dup detection.  Payloads are encoded
    once per distinct content key (<= n_variants per batch), not per ref."""
    refs = _media_refs(batch)
    cache: dict = {}
    payloads = []
    for r in refs:
        k = content_key(r, n_variants)
        if k not in cache:
            cache[k] = png_payload(k)
        payloads.append(cache[k])
    return _media_table(refs, payloads, "image")


def ahash_hex(thumbs: np.ndarray) -> np.ndarray:
    """Average-hash (aHash) per image: bit i = pixel_i > image mean, packed
    big-endian to a 16-hex-char string.  ``thumbs`` is (n, 64) uint8 (the
    decode stage's 8x8 thumbnails row-major).  Vectorized threshold+pack;
    the final hex formatting is per-image (images per batch are bounded by
    the small media batch_size)."""
    if len(thumbs) == 0:
        return np.empty(0, dtype=object)
    means = thumbs.mean(axis=1, keepdims=True)
    bits = (thumbs > means).astype(np.uint8)
    packed = np.packbits(bits, axis=1)
    return np.array([p.tobytes().hex() for p in packed], dtype=object)


VIDEO_MAGIC = b"VSEQ"


def video_payload(media_ref: str, n_frames: int | None = None,
                  h: int = 24, w: int = 32) -> bytes:
    """Deterministic multi-frame "video" container keyed by media_ref:
    ``VSEQ`` magic + uint32 frame count + length-prefixed per-frame REAL
    PNGs (frame i keyed by ``{media_ref}#f{i}``) — the sandbox stand-in
    for a fetched video blob.  Frame count derives from the ref hash
    (1..24) unless pinned."""
    if n_frames is None:
        n_frames = 1 + int.from_bytes(
            hashlib.md5(media_ref.encode()).digest()[:2], "big") % 24
    parts = [VIDEO_MAGIC, n_frames.to_bytes(4, "big")]
    for i in range(n_frames):
        p = png_payload(f"{media_ref}#f{i}", h, w)
        parts.append(len(p).to_bytes(4, "big"))
        parts.append(p)
    return b"".join(parts)


def split_video_frames(payload: bytes) -> list[bytes]:
    """Parse the VSEQ container back into per-frame PNG byte strings."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VSEQ container")
    n = int.from_bytes(payload[4:8], "big")
    frames, off = [], 8
    for _ in range(n):
        ln = int.from_bytes(payload[off:off + 4], "big")
        off += 4
        frames.append(payload[off:off + ln])
        off += ln
    if off != len(payload):
        raise ValueError("trailing bytes in VSEQ container")
    return frames


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Uniform deterministic frame sample: floor(j * n / k) for j < k
    (strictly increasing when n >= k); all frames when n < k."""
    if n_frames <= k:
        return list(range(n_frames))
    return [(j * n_frames) // k for j in range(k)]


def video_rows_from_spans(batch: pa.Table) -> pa.Table:
    """pages(spans) -> video table rows (one per media span), payload
    "fetched" as a deterministic VSEQ multi-frame container."""
    refs = _media_refs(batch)
    return _media_table(refs, [video_payload(r) for r in refs], "video")


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    Usage::

        media_ds.map_batches(MediaDecodeStage, fn_constructor_kwargs=
                             {"codec": "synth", "target_size": (64, 64)},
                             batch_size=32, concurrency=4, num_cpus=1,
                             batch_format="pyarrow")

    ``codec="synth"`` produces a deterministic 8x8 uint8 "thumbnail" (mean
    pooling over the payload keystream) plus a feature vector — the stand-in
    for decode+resize.  ``codec="pil"``/``"ffmpeg"`` raise
    :class:`MediaCodecUnavailable` here (the real implementations drop in
    behind the same signature when the libraries exist).
    """

    REAL_CODECS = ("pil", "ffmpeg")

    def __init__(self, codec: str = "png", target_size: tuple[int, int] = (8, 8),
                 feature_dim: int = 16) -> None:
        if codec in self.REAL_CODECS:
            raise MediaCodecUnavailable(
                f"codec {codec!r} needs libraries not present in this sandbox; "
                "use codec='png' (real stdlib decode) or codec='synth'"
            )
        if codec not in ("png", "synth"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        self.target_size = target_size
        self.feature_dim = feature_dim
        if codec == "png":
            from crawler_ray.functions.png import decode_png_gray

            self._decode_png = decode_png_gray  # bound once per actor

    def _decode_png_one(self, payload: bytes) -> tuple[np.ndarray, np.ndarray, int, int]:
        """REAL decode: parse + inflate + unfilter, then mean-pool resize to
        target_size and derive a brightness-histogram feature vector."""
        img = self._decode_png(payload)
        ih, iw = img.shape
        h, w = self.target_size
        ys = (np.arange(h + 1) * ih) // h
        xs = (np.arange(w + 1) * iw) // w
        thumb = np.empty((h, w), dtype=np.uint8)
        for y in range(h):
            rows = img[ys[y]:max(ys[y] + 1, ys[y + 1])]
            for x in range(w):
                thumb[y, x] = int(rows[:, xs[x]:max(xs[x] + 1, xs[x + 1])].mean())
        hist, _ = np.histogram(img, bins=self.feature_dim, range=(0, 256))
        feat = (hist / hist.sum()).astype(np.float32)
        return thumb, feat, ih, iw

    def _decode_one(self, payload: bytes) -> tuple[np.ndarray, np.ndarray]:
        h, w = self.target_size
        raw = np.frombuffer(payload, dtype=np.uint8)
        pixels = raw[: h * w * max(1, len(raw) // (h * w)) ]
        usable = pixels[: (len(pixels) // (h * w)) * h * w]
        thumb = usable.reshape(h * w, -1).mean(axis=1).astype(np.uint8).reshape(h, w)
        feat = np.asarray(
            [float(usable[i :: self.feature_dim].mean()) for i in range(self.feature_dim)],
            dtype=np.float32,
        )
        return thumb, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, feats, img_hs, img_ws = [], [], [], []
        for payload in batch["payload"].to_pylist():
            if self.codec == "png":
                t, f, ih, iw = self._decode_png_one(payload)
            else:
                t, f = self._decode_one(payload)
                ih, iw = self.target_size
            thumbs.append(t.reshape(-1).tolist())
            feats.append(f.tolist())
            img_hs.append(ih)
            img_ws.append(iw)
        h, w = self.target_size
        return (
            batch.drop_columns(["payload"])  # decoded output: drop the wide column
            .append_column("thumb", pa.array(thumbs, type=pa.list_(pa.uint8())))
            .append_column("features", pa.array(feats, type=pa.list_(pa.float32())))
            .append_column("thumb_h", pa.array([h] * len(batch), type=pa.int32()))
            .append_column("thumb_w", pa.array([w] * len(batch), type=pa.int32()))
            .append_column("img_h", pa.array(img_hs, type=pa.int32()))
            .append_column("img_w", pa.array(img_ws, type=pa.int32()))
        )


class FrameSampleStage:
    """Actor-pool video frame-sampling stage: split the VSEQ container,
    sample k frames uniformly (deterministic indices — no RNG), REAL-decode
    each sampled frame with the stdlib PNG codec, and emit ONE ROW PER
    SAMPLED FRAME (flat_map-shaped expansion inside map_batches).

    Usage::

        video_ds.map_batches(FrameSampleStage, fn_constructor_kwargs=
                             {"k": 4}, batch_size=8, concurrency=4,
                             num_cpus=1, batch_format="pyarrow")

    Decode state (codec binding, pooling geometry) is built once per actor
    in ``__init__``; payloads are wide, so callers keep ``batch_size``
    small (SURVEY.md §7.4 wide-rows note).  Real ffmpeg decode would drop
    in behind the same signature (``codec="ffmpeg"`` raises
    :class:`MediaCodecUnavailable` in this sandbox)."""

    def __init__(self, k: int = 4, codec: str = "png",
                 target_size: tuple[int, int] = (8, 8),
                 feature_dim: int = 16) -> None:
        if codec == "ffmpeg":
            raise MediaCodecUnavailable(
                "codec 'ffmpeg' needs libraries not present in this sandbox; "
                "use codec='png' (VSEQ container of real PNG frames)"
            )
        if codec != "png":
            raise ValueError(f"unknown codec {codec!r}")
        self.k = k
        self._decoder = MediaDecodeStage(
            codec="png", target_size=target_size, feature_dim=feature_dim
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, n_frames_col, idxs_col = [], [], []
        thumbs, feats = [], []
        for ref, payload in zip(
            batch["media_ref"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames = split_video_frames(payload)
            for idx in sample_frame_indices(len(frames), self.k):
                thumb, feat, _ih, _iw = self._decoder._decode_png_one(frames[idx])
                refs.append(ref)
                n_frames_col.append(len(frames))
                idxs_col.append(idx)
                thumbs.append(thumb.reshape(-1).tolist())
                feats.append(feat.tolist())
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "n_frames": pa.array(n_frames_col, type=pa.int64()),
                "frame_idx": pa.array(idxs_col, type=pa.int64()),
                "thumb": pa.array(thumbs, type=pa.list_(pa.uint8())),
                "features": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def wav_payload(media_ref: str, sample_rate: int = 8000) -> bytes:
    """Deterministic REAL RIFF/WAVE PCM16 payload keyed by media_ref
    (stdlib ``wave`` encoder) — the sandbox stand-in for fetching an audio
    blob.  The waveform is a ref-keyed sine plus a sha256-keystream noise
    floor; duration derives from the ref hash (~0.1-0.6 s)."""
    import io
    import wave

    hv = hashlib.md5(media_ref.encode()).digest()
    n = 1000 + int.from_bytes(hv[:2], "big") % 4000
    freq = 100 + int.from_bytes(hv[2:4], "big") % 800
    t = np.arange(n, dtype=np.float64)
    sig = 12000.0 * np.sin(2.0 * np.pi * freq * t / sample_rate)
    noise_bytes = synth_payload(media_ref + "#noise", n)
    noise = (np.frombuffer(noise_bytes, dtype=np.uint8).astype(np.float64)
             - 127.5) * 16.0
    pcm = np.clip(sig + noise, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode via the stdlib ``wave`` parser: (int16 samples, rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("expected mono PCM16")
        rate = w.getframerate()
        samples = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    return samples, rate


def audio_rows_from_spans(batch: pa.Table) -> pa.Table:
    """pages(spans) -> audio table rows (one per media span), payload
    "fetched" as a deterministic real WAV blob."""
    refs = _media_refs(batch)
    return _media_table(refs, [wav_payload(r) for r in refs], "audio")


class AudioFeatureStage:
    """Actor-pool audio decode + feature extraction: parse the WAV
    container, then compute INTEGER-EXACT waveform features (zero
    crossings, peak amplitude, energy as sum of squared samples, duration)
    — integral outputs make the golden-VALUES oracle compare bit-exact.

    Usage::

        audio_ds.map_batches(AudioFeatureStage, batch_size=32,
                             concurrency=4, num_cpus=1,
                             batch_format="pyarrow")

    Real torchaudio/librosa feature stacks would drop in behind the same
    signature (``backend="librosa"`` raises :class:`MediaCodecUnavailable`
    in this sandbox)."""

    def __init__(self, backend: str = "wave") -> None:
        if backend in ("librosa", "torchaudio"):
            raise MediaCodecUnavailable(
                f"backend {backend!r} needs libraries not present in this "
                "sandbox; use backend='wave' (real stdlib RIFF/WAVE decode)"
            )
        if backend != "wave":
            raise ValueError(f"unknown backend {backend!r}")

    @staticmethod
    def _features_one(payload: bytes) -> tuple[int, int, int, int, int]:
        x, rate = decode_wav(payload)
        n = len(x)
        xi = x.astype(np.int64)
        zc = int(np.count_nonzero(np.signbit(xi[1:]) != np.signbit(xi[:-1])))
        peak = int(np.abs(xi).max()) if n else 0
        energy = int((xi * xi).sum())
        duration_ms = n * 1000 // rate
        return n, duration_ms, zc, peak, energy

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._features_one(p) for p in batch["payload"].to_pylist()]
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return (
            batch.drop_columns(["payload"])
            .append_column("n_samples", pa.array(cols[0], type=pa.int64()))
            .append_column("duration_ms", pa.array(cols[1], type=pa.int64()))
            .append_column("zero_crossings", pa.array(cols[2], type=pa.int64()))
            .append_column("peak", pa.array(cols[3], type=pa.int64()))
            .append_column("energy", pa.array(cols[4], type=pa.int64()))
        )
