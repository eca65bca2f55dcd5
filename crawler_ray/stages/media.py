"""Multimodal columns: typed binary payloads + actor-pool decode stages.

The reference stores raw HTML and extracted documents as GCS blobs keyed
from the page row (``/root/reference/crawler/services/storage.py:16-104``,
``gcs_documents`` JSONB on crawled_page).  At 100 TB training-data scale the
same shape generalizes to image/audio/video payloads: an opaque ``binary``
column plus typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are NOT in this container, so the decode
kernels are stubs behind ``MediaCodecUnavailable`` with a deterministic fake
("synth" codec) used by tests — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested:

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


def media_rows_from_spans(batch: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """pages(spans) -> media table rows (one per media span), payload
    "fetched" via the deterministic synth blob store."""
    refs = []
    for spans in batch["spans"].to_pylist():
        for s in spans or []:
            if s["kind"] == "media" and s["media_ref"]:
                refs.append(s["media_ref"])
    payloads = [synth_payload(r, payload_bytes) for r in refs]
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "kind": pa.array(["image"] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


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

    def __init__(self, codec: str = "synth", target_size: tuple[int, int] = (8, 8),
                 feature_dim: int = 16) -> None:
        if codec in self.REAL_CODECS:
            raise MediaCodecUnavailable(
                f"codec {codec!r} needs libraries not present in this sandbox; "
                "use codec='synth' for the deterministic fake"
            )
        if codec != "synth":
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        self.target_size = target_size
        self.feature_dim = feature_dim

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
        thumbs, feats = [], []
        for payload in batch["payload"].to_pylist():
            t, f = self._decode_one(payload)
            thumbs.append(t.reshape(-1).tolist())
            feats.append(f.tolist())
        h, w = self.target_size
        return (
            batch.drop_columns(["payload"])  # decoded output: drop the wide column
            .append_column("thumb", pa.array(thumbs, type=pa.list_(pa.uint8())))
            .append_column("features", pa.array(feats, type=pa.list_(pa.float32())))
            .append_column("thumb_h", pa.array([h] * len(batch), type=pa.int32()))
            .append_column("thumb_w", pa.array([w] * len(batch), type=pa.int32()))
        )
