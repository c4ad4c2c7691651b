"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The reference's media path (ffmpeg demux TranscriptGenerator.py:42-55,
frame extraction VideoProcessor.py:46-84, thumbnail render
PdfProcessor.py:34, JPEG encode DocProcAiService.py:123-124) needs native
decoders that are NOT in this container — so the decode kernels here are
STUBS behind ``Decoder`` implementations:

- ``NotImplementedDecoder`` raises ``NotImplementedError`` (the marked
  stub — swap in a PIL/ffmpeg-backed Decoder on a cluster that has them);
- ``DeterministicFakeDecoder`` derives plausible metadata/features from a
  hash of the payload bytes, so the Ray-side plumbing — schema, batch
  sizing for large binary rows, actor signature, output layout — is real
  and tested end-to-end.

Scale notes: binary payloads are MBs/row → small ``batch_size`` (default
32) and the payload column is dropped in-batch once features are computed,
so downstream shuffles never carry raw media (same discipline as the html
column, SURVEY.md §7.4 wide-rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class Decoder:
    """Decode one media payload → (width, height, n_frames, feature[dim])."""

    def decode(self, payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
        raise NotImplementedError


class NotImplementedDecoder(Decoder):
    """The real-decoder slot. Image/audio libraries are not available in
    this environment; installing PIL/ffmpeg and implementing ``decode``
    here is the only change needed — the Ray plumbing stays as-is."""

    def decode(self, payload: bytes, kind: str):  # pragma: no cover - stub
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg, not present in this container"
        )


class DeterministicFakeDecoder(Decoder):
    """Hash-derived stand-in: same payload → same metadata/features."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def decode(self, payload: bytes, kind: str):
        h = hashlib.blake2b(payload or b"", digest_size=32).digest()
        width = 160 + h[0] * 8
        height = 120 + h[1] * 8
        n_frames = 1 if kind == "image" else 1 + h[2]
        rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        feat = np.resize(rng, self.feature_dim)
        n = float(np.linalg.norm(feat)) or 1.0
        return int(width), int(height), int(n_frames), (feat / n).astype(np.float32)


def media_features_schema(dim: int) -> pa.Schema:
    return pa.schema(
        [
            pa.field("media_id", pa.string()),
            pa.field("kind", pa.string()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("n_frames", pa.int32()),
            pa.field("n_bytes", pa.int64()),
            pa.field("feature", pa.list_(pa.float32(), dim)),
        ]
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decoder constructed once per actor (the model-load
    slot); payload column consumed and dropped in-batch."""

    def __init__(self, decoder_factory=DeterministicFakeDecoder, feature_dim: int = 16,
                 id_col: str = "media_id", payload_col: str = "payload",
                 kind_col: str = "kind"):
        self.decoder = decoder_factory(feature_dim) if decoder_factory is DeterministicFakeDecoder else decoder_factory()
        self.dim = feature_dim
        self.id_col, self.payload_col, self.kind_col = id_col, payload_col, kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        kinds = batch[self.kind_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        w, h, f, nb, feats = [], [], [], [], []
        for pid, kind, payload in zip(ids, kinds, payloads):
            wi, hi, fi, feat = self.decoder.decode(payload, kind)
            w.append(wi)
            h.append(hi)
            f.append(fi)
            nb.append(len(payload or b""))
            feats.append(feat)
        flat = np.concatenate(feats).astype(np.float32) if feats else np.empty(0, np.float32)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(w, pa.int32()),
                pa.array(h, pa.int32()),
                pa.array(f, pa.int32()),
                pa.array(nb, pa.int64()),
                pa.FixedSizeListArray.from_arrays(pa.array(flat), self.dim),
            ],
            schema=media_features_schema(self.dim),
        )


_EXT_KIND = {
    ".jpg": "image", ".jpeg": "image", ".png": "image", ".bmp": "image",
    ".gif": "image", ".wav": "audio", ".mp3": "audio", ".flac": "audio",
    ".mp4": "video", ".mkv": "video", ".webm": "video", ".avi": "video",
}


def read_media_files(paths, *, batch_size: int = 32):
    """Real-file media source: ``ray.data.read_binary_files`` (one row per
    file, bytes + path) → (media_id, kind, payload) with kind dispatched
    from the file extension (the content-type dispatch analog of
    fileextractlib/DocumentProcessor.py:25-30). Feed the result straight
    into extract_media_features."""
    import os

    import ray.data as rd

    raw = rd.read_binary_files(paths, include_paths=True)

    def to_media(batch: pa.Table) -> pa.Table:
        paths_col = batch["path"].to_pylist()
        kinds = [
            _EXT_KIND.get(os.path.splitext(p)[1].lower(), "binary")
            for p in paths_col
        ]
        return pa.Table.from_arrays(
            [
                pa.array(paths_col, pa.string()),
                pa.array(kinds, pa.string()),
                batch["bytes"].combine_chunks(),
            ],
            names=["media_id", "kind", "payload"],
        )

    return raw.map_batches(to_media, batch_format="pyarrow", batch_size=batch_size)


def extract_media_features(ds, *, feature_dim: int = 16, batch_size: int = 32,
                           concurrency: int = 2,
                           decoder_factory=DeterministicFakeDecoder):
    """binary media Dataset → feature table (payload dropped in-batch)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={
            "decoder_factory": decoder_factory,
            "feature_dim": feature_dim,
        },
        batch_format="pyarrow",
        batch_size=batch_size,  # MB-scale rows: keep batches small
        concurrency=concurrency,
        num_cpus=1,
    )
