"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The reference's media path (ffmpeg demux TranscriptGenerator.py:42-55,
frame extraction VideoProcessor.py:46-84, thumbnail render
PdfProcessor.py:34, JPEG encode DocProcAiService.py:123-124) needs native
decoders there. The default ``StdlibDecoder`` REALLY decodes with pure
numpy/stdlib codecs: PNG and 24-bit BMP pixels (functions/mediacodec.py),
baseline JPEG pixels (functions/jpegcodec.py — T.81 sequential, huffman +
IDCT in numpy), WAV PCM, GIF header dimensions, AVI demux with MJPEG
per-frame pixel decode (movi ``..dc`` chunks → jpeg_decode), and MP4
demux via a real ISO-BMFF sample-table walk (stsd/stsz/stsc/stco →
``mp4_frames``) with MJPEG-track pixel decode. Only the compressed-video
CODEC layer (H.264, VP9) stays behind ``NotImplementedDecoder`` — swap
in an ffmpeg-backed Decoder on a cluster that has one; the Ray plumbing
is identical either way.
``DeterministicFakeDecoder`` (hash-derived metadata) remains for plumbing
tests that want format-independent payloads.

Scale notes: binary payloads are MBs/row → small ``batch_size`` (default
32) and the payload column is dropped in-batch once features are computed,
so downstream shuffles never carry raw media (same discipline as the html
column, SURVEY.md §7.4 wide-rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import mediacodec as mc


class Decoder:
    """Decode one media payload → (width, height, n_frames, feature[dim])."""

    def decode(self, payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
        raise NotImplementedError


class NotImplementedDecoder(Decoder):
    """The native-decoder slot for compressed-video CODECS pure Python
    cannot reasonably reach (H.264, VP9 — container demux for MP4/AVI is
    already real in mediacodec). Installing ffmpeg and implementing
    ``decode`` here is the only change needed — the Ray plumbing stays
    as-is."""

    def decode(self, payload: bytes, kind: str):  # pragma: no cover - stub
        raise NotImplementedError(
            "H.264/VP9 decoding requires ffmpeg, not present in this container"
        )


class StdlibDecoder(Decoder):
    """REAL decode via pure-stdlib codecs (functions/mediacodec.py),
    dispatched on magic bytes (content sniffing beats the extension):

    - PNG / 24-bit BMP / baseline JPEG → full pixel decode; feature =
      luminance histogram of the actual pixels; n_frames = 1.
    - WAV → full PCM decode; feature = per-band RMS energy of the actual
      samples; (width, height) = (channels, sample rate); n_frames = PCM
      frame count (the duration-probe analog, SURVEY M8).
    - GIF → full first-frame pixel decode (classic LZW, pure Python);
      feature = luminance histogram of the actual pixels.
    - AVI → demux the ``movi`` list; MJPEG frames decode to PIXELS
      (feature = mean luminance histogram over up to 3 sampled frames,
      n_frames = real frame-chunk count); a frameless container falls
      back to the ``avih`` metadata probe.
    - MP4 → ISO-BMFF sample-table demux (mediacodec.mp4_frames); MJPEG
      ('jpeg') tracks decode to pixels exactly like AVI; compressed-codec
      tracks fall back to the container probe (sample count + stsd dims).

    Unknown payloads raise ValueError — garbage should fail loudly, not
    fake features."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def _byte_hist(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        feat = np.resize(hist, self.feature_dim)
        n = float(np.linalg.norm(feat)) or 1.0
        return feat / n

    def decode(self, payload: bytes, kind: str):
        payload = payload or b""
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            img = mc.png_decode(payload)
            h, w = img.shape[:2]
            return w, h, 1, mc.gray_histogram_feature(img, self.feature_dim)
        if payload[:2] == b"BM":
            img = mc.bmp_decode(payload)
            h, w = img.shape[:2]
            return w, h, 1, mc.gray_histogram_feature(img, self.feature_dim)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            samples, rate = mc.wav_decode(payload)
            feat = mc.audio_band_feature(samples, self.feature_dim)
            return samples.shape[1], rate, samples.shape[0], feat
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from ..functions.jpegcodec import jpeg_decode

            frames = mc.avi_frames(payload)
            jfs = [f for f in frames if f[:2] == b"\xff\xd8"]
            if jfs:
                # sample ≤3 frames evenly; average their pixel histograms
                picks = jfs[:: max(1, len(jfs) // 3)][:3]
                imgs = [jpeg_decode(f) for f in picks]
                feat = np.mean(
                    [mc.gray_histogram_feature(i, self.feature_dim) for i in imgs],
                    axis=0,
                ).astype(np.float32)
                h, w = imgs[0].shape[:2]
                return w, h, len(frames), feat
            w, h, nf = mc.avi_probe(payload)
            return w, h, nf, self._byte_hist(payload)
        if payload[4:8] == b"ftyp":
            from ..functions.jpegcodec import jpeg_decode

            frames = mc.mp4_frames(payload)
            jfs = [f for f in frames if f[:2] == b"\xff\xd8"]
            if jfs:
                picks = jfs[:: max(1, len(jfs) // 3)][:3]
                imgs = [jpeg_decode(f) for f in picks]
                feat = np.mean(
                    [mc.gray_histogram_feature(i, self.feature_dim) for i in imgs],
                    axis=0,
                ).astype(np.float32)
                h, w = imgs[0].shape[:2]
                return w, h, len(frames), feat
            w, h, nf, _codec = mc.mp4_probe(payload)
            return w, h, nf, self._byte_hist(payload)
        if payload[:2] == b"\xff\xd8":
            from ..functions.jpegcodec import jpeg_decode

            img = jpeg_decode(payload)
            h, w = img.shape[:2]
            return w, h, 1, mc.gray_histogram_feature(img, self.feature_dim)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            img = mc.gif_decode(payload)
            h, w = img.shape[:2]
            return w, h, 1, mc.gray_histogram_feature(img, self.feature_dim)
        raise ValueError(f"undecodable payload (kind={kind}, head={payload[:8]!r})")


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
        import inspect

        # Decide by SIGNATURE whether the factory takes a feature_dim, so a
        # genuine TypeError raised inside the factory body propagates instead
        # of being masked by a silent no-arg retry (wrong-dim features).
        try:
            takes_dim = len(inspect.signature(decoder_factory).parameters) >= 1
        except (TypeError, ValueError):  # builtins / C callables: assume yes
            takes_dim = True
        self.decoder = decoder_factory(feature_dim) if takes_dim else decoder_factory()
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


class ThumbnailRenderer:
    """Actor-pool stage: decode image payloads (PNG / 24-bit BMP /
    baseline JPEG) — and for MJPEG AVIs/MP4s, the FIRST video frame (the
    reference's video-thumbnail flow, VideoProcessor.py:46-84) —
    block-mean downsample to fit ``max_px``, re-encode as PNG (the
    thumbnail-render + image-encode analog; reference renders page
    thumbnails PdfProcessor.py:34 and JPEG-encodes them
    DocProcAiService.py:123-124).

    Output: (media_id, thumb, thumb_w, thumb_h) — payload dropped
    in-batch, thumbnails are ≤ max_px² so downstream rows are small."""

    def __init__(self, max_px: int = 64, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.max_px = max_px
        self.id_col, self.payload_col = id_col, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs, ws, hs = [], [], [], []
        for pid, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            payload = payload or b""
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                img = mc.png_decode(payload)
            elif payload[:2] == b"BM":
                img = mc.bmp_decode(payload)
            elif payload[:6] in (b"GIF87a", b"GIF89a"):
                img = mc.gif_decode(payload)
            elif payload[:2] == b"\xff\xd8":
                from ..functions.jpegcodec import jpeg_decode

                img = jpeg_decode(payload)
            elif (payload[:4] == b"RIFF" and payload[8:12] == b"AVI ") or (
                payload[4:8] == b"ftyp"
            ):
                from ..functions.jpegcodec import jpeg_decode

                frames = (
                    mc.avi_frames(payload)
                    if payload[:4] == b"RIFF"
                    else mc.mp4_frames(payload)
                )
                jfs = [f for f in frames if f[:2] == b"\xff\xd8"]
                if not jfs:
                    continue  # frameless container — no pixels to render
                img = jpeg_decode(jfs[0])
            else:
                continue  # non-image rows are SKIPPED: thumbnail output holds
                # only (media_id, thumb, ...) rows for decodable payloads
            h, w = img.shape[:2]
            scale = max(h, w) / self.max_px
            th = max(1, int(round(h / scale))) if scale > 1 else h
            tw = max(1, int(round(w / scale))) if scale > 1 else w
            thumb = mc.block_mean_resize(img, th, tw)
            ids.append(pid)
            thumbs.append(mc.png_encode(thumb))
            ws.append(thumb.shape[1])
            hs.append(thumb.shape[0])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(thumbs, pa.binary()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
            ],
            names=["media_id", "thumb", "thumb_w", "thumb_h"],
        )


def render_thumbnails(ds, *, max_px: int = 64, batch_size: int = 32,
                      concurrency: int = 2):
    """binary media Dataset → (media_id, thumb PNG, thumb_w, thumb_h)."""
    return ds.map_batches(
        ThumbnailRenderer,
        fn_constructor_kwargs={"max_px": max_px},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


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


class FrameSampler:
    """Actor-pool stage: AVI or MP4 payload → every ``every_k``-th MJPEG frame
    decoded to pixels and re-encoded as PNG rows (media_id, frame_idx,
    frame_w, frame_h, frame) — the frame-extraction analog of the
    reference's ``VideoProcessor.extract_frames`` (fileextractlib/
    VideoProcessor.py:46-84, ffmpeg there, pure numpy here). Non-video
    rows are skipped; the source payload is dropped in-batch so downstream
    shuffles carry ≤ frame-sized rows only."""

    def __init__(self, every_k: int = 2, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.every_k = max(1, every_k)
        self.id_col, self.payload_col = id_col, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.jpegcodec import jpeg_decode

        ids, idxs, ws, hs, frames = [], [], [], [], []
        for pid, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            payload = payload or b""
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                container_frames = mc.avi_frames(payload)
            elif payload[4:8] == b"ftyp":
                container_frames = mc.mp4_frames(payload)
            else:
                continue
            for fi, fr in enumerate(container_frames):
                if fi % self.every_k or fr[:2] != b"\xff\xd8":
                    continue
                img = jpeg_decode(fr)
                h, w = img.shape[:2]
                ids.append(pid)
                idxs.append(fi)
                ws.append(w)
                hs.append(h)
                frames.append(mc.png_encode(img))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(idxs, pa.int32()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(frames, pa.binary()),
            ],
            names=["media_id", "frame_idx", "frame_w", "frame_h", "frame"],
        )


def sample_video_frames(ds, *, every_k: int = 2, batch_size: int = 16,
                        concurrency: int = 2):
    """binary media Dataset → sampled decoded video frames (PNG rows)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
