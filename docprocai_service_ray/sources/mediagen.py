"""Deterministic REAL-media corpus: valid PNG / BMP / WAV / AVI files
synthesized from a seed, written once under /tmp and read back with
``ray.data.read_binary_files``.

Unlike hash-fake payloads, these are genuinely decodable files — the
StdlibDecoder pixel/PCM kernels run for real on them (images: seeded
gradient + rectangle pattern; audio: two-tone sine mix; AVI: a valid RIFF
container whose ``avih`` header carries real metadata around an empty
``movi`` list — codec frames would need ffmpeg to produce).
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
    """Minimal valid RIFF/AVI: hdrl list with a real ``avih`` main header
    (width/height/frame count) + empty ``movi`` list."""
    rng = np.random.RandomState((seed * 3_000_003 + idx) & 0x7FFFFFFF)
    w, h = int(rng.randint(160, 1920)), int(rng.randint(120, 1080))
    frames = int(rng.randint(24, 2400))
    avih = struct.pack(
        "<IIIIIIIIII", 33367, 0, 0, 0x10, frames, 0, 1, 0, w, h
    ) + b"\x00" * 16
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    riff_body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def ensure_media_corpus(n: int, seed: int, root: str = "/tmp/raykg_mediagen") -> str:
    """Write ``n`` real media files (cycling png/bmp/wav/avi) once; cached
    by (n, seed). Returns the directory to hand to read_media_files.
    The .done marker lives OUTSIDE the dir so read_binary_files never
    scans it."""
    out = os.path.join(root, f"n{n}_s{seed}")
    done = out + ".done"
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        kind = i % 4
        if kind == 0:
            path = os.path.join(out, f"media-{i:05d}.png")
            payload = mc.png_encode(gen_image(seed, i))
        elif kind == 1:
            path = os.path.join(out, f"media-{i:05d}.bmp")
            payload = mc.bmp_encode(gen_image(seed, i))
        elif kind == 2:
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
