"""Deterministic REAL-media corpus: valid PNG / BMP / JPEG / GIF / WAV /
AVI files synthesized from a seed, written once under /tmp and read back with
``ray.data.read_binary_files``.

Unlike hash-fake payloads, these are genuinely decodable files — the
StdlibDecoder pixel/PCM kernels run for real on them (images: seeded
gradient + rectangle pattern; JPEG via the pure-numpy baseline codec in
functions/jpegcodec.py; audio: two-tone sine mix; AVI: a valid RIFF
container whose ``movi`` list carries real MJPEG frames — every frame is
a complete baseline JPEG, so frame extraction + pixel decode run for
real with zero native dependencies).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..functions import mediacodec as mc


def gen_image(seed: int, idx: int) -> np.ndarray:
    """(H, W, 3) uint8: gradient background + seeded rectangles."""
    rng = np.random.RandomState((seed * 1_000_003 + idx) & 0x7FFFFFFF)
    h, w = int(rng.randint(48, 160)), int(rng.randint(48, 160))
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            np.full((h, w), rng.randint(0, 256), dtype=np.uint8),
        ],
        axis=2,
    )
    for _ in range(int(rng.randint(1, 5))):
        y0, x0 = int(rng.randint(0, h // 2)), int(rng.randint(0, w // 2))
        y1, x1 = y0 + int(rng.randint(4, h // 2)), x0 + int(rng.randint(4, w // 2))
        img[y0:y1, x0:x1] = rng.randint(0, 256, 3, dtype=np.uint8)
    return img


def gen_audio(seed: int, idx: int) -> tuple[np.ndarray, int]:
    """((n, 1) int16 PCM, rate): two-tone sine mix, 0.05–0.4 s."""
    rng = np.random.RandomState((seed * 2_000_003 + idx) & 0x7FFFFFFF)
    rate = 8000
    n = int(rng.randint(rate // 20, rate * 2 // 5))
    t = np.arange(n) / rate
    f1, f2 = rng.randint(100, 1200), rng.randint(100, 1200)
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    return (wave * 20000).astype(np.int16)[:, None], rate


def gen_avi(seed: int, idx: int) -> bytes:
    """Valid RIFF/AVI with a real ``avih`` main header AND real MJPEG
    frames: the ``movi`` list carries 3-6 ``00dc`` chunks, each a complete
    baseline JPEG of an evolving seeded pattern (functions/jpegcodec.py) —
    demux + per-frame pixel decode are genuinely exercisable."""
    from ..functions.jpegcodec import jpeg_encode

    rng = np.random.RandomState((seed * 3_000_003 + idx) & 0x7FFFFFFF)
    n_frames = int(rng.randint(3, 7))
    base = gen_image(seed, idx)
    h, w = base.shape[:2]
    movi = bytearray(b"movi")
    for f in range(n_frames):
        frame = np.roll(base, shift=f * 7, axis=1)  # simple motion
        payload = jpeg_encode(frame, quality=85)
        movi += b"00dc" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            movi += b"\x00"  # chunks are word-aligned
    avih = struct.pack(
        "<IIIIIIIIII", 33367, 0, 0, 0x10, n_frames, 0, 1, 0, w, h
    ) + b"\x00" * 16
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    riff_body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def ensure_media_corpus(n: int, seed: int, root: str = "/tmp/raykg_mediagen") -> str:
    """Write ``n`` real media files (cycling png/bmp/wav/avi) once; cached
    by (n, seed). Returns the directory to hand to read_media_files.
    The .done marker lives OUTSIDE the dir so read_binary_files never
    scans it."""
    # v3: MJPEG frames + jpg + gif kinds (bump invalidates older caches)
    out = os.path.join(root, f"v3_n{n}_s{seed}")
    done = out + ".done"
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    from ..functions.jpegcodec import jpeg_encode

    for i in range(n):
        kind = i % 6
        if kind == 0:
            path = os.path.join(out, f"media-{i:05d}.png")
            payload = mc.png_encode(gen_image(seed, i))
        elif kind == 1:
            path = os.path.join(out, f"media-{i:05d}.bmp")
            payload = mc.bmp_encode(gen_image(seed, i))
        elif kind == 2:
            path = os.path.join(out, f"media-{i:05d}.jpg")
            payload = jpeg_encode(gen_image(seed, i), quality=88)
        elif kind == 3:
            path = os.path.join(out, f"media-{i:05d}.gif")
            img = gen_image(seed, i)
            idx = (img[:, :, 0] >> 4).astype(np.uint8)  # 16-level luminance
            pal = np.stack([np.arange(16) * 17] * 3, axis=1).astype(np.uint8)
            payload = mc.gif_encode(idx, pal)
        elif kind == 4:
            path = os.path.join(out, f"media-{i:05d}.wav")
            samples, rate = gen_audio(seed, i)
            payload = mc.wav_encode(samples, rate)
        else:
            path = os.path.join(out, f"media-{i:05d}.avi")
            payload = gen_avi(seed, i)
        with open(path, "wb") as f:
            f.write(payload)
    with open(done, "w") as f:
        f.write("ok")
    return out
