"""Stable hashing primitives: content hashes, hash embeddings, MinHash,
SimHash, LSH band keys.

Everything here is a pure function of its inputs plus an explicit seed —
never Python's builtin ``hash`` (PYTHONHASHSEED-dependent) and never
``random`` without a seed — so signatures are identical across processes,
nodes and runs (SURVEY.md §4.3 determinism; the two-cluster-size
equivalence check depends on this).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE_P = (1 << 61) - 1  # modulus for universal hashing


def stable_u32(s: str, seed: int = 0) -> int:
    """Stable 32-bit hash of a string (crc32; cheap, deterministic)."""
    return zlib.crc32(s.encode("utf-8"), seed & 0xFFFFFFFF) & 0xFFFFFFFF


def stable_u64(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash (blake2b-8) — for bucket/salt keys and SimHash."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def char_shingles(s: str, k: int) -> list[str]:
    """Char k-grams of a normalized string ('' padding-free; short strings
    yield the string itself so no surface hashes to an empty set)."""
    s = s.lower()
    if len(s) <= k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def minhash_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficient vectors for h_i(x) = (a_i*x + b_i) mod p."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perms, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perms]) from uint64 shingle hashes.

    Vectorized: (n_shingles, 1) × (num_perms,) broadcast, min over shingles.
    Empty input → all-max signature (never collides with real content).
    """
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    # inputs are masked to 32 bits so the affine step stays inside the
    # intended universal-hash family for ANY caller (crc32 shingles are
    # already < 2^32; 64-bit rolling-window hashes from document-level
    # shingling get reduced here instead of wrapping mod 2^64)
    x = (shingle_hashes.astype(np.uint64) & np.uint64(0xFFFFFFFF)).reshape(-1, 1)
    # (a*x + b) mod p without 128-bit ints: reduce a mod 2^31 as a2, then
    # a2*x < 2^63 and a2*x + b < 2^63 + 2^61 fits uint64 before the mod-p.
    a2 = (a % np.uint64(1 << 31)) | np.uint64(1)
    hv = (a2 * x + b) % np.uint64(_MERSENNE_P)
    return hv.min(axis=0)


def surface_shingle_hashes(surface: str, k: int) -> np.ndarray:
    """uint64 (crc32-valued) hashes of the char k-gram shingle set."""
    grams = set(char_shingles(surface, k))
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.array(sorted(zlib.crc32(g.encode("utf-8")) for g in grams), dtype=np.uint64)


def band_keys(signature: np.ndarray, bands: int) -> list[int]:
    """Split a signature into ``bands`` equal bands; one stable 64-bit key
    per band (band index mixed in so band i of doc A never collides with
    band j of doc B)."""
    rows = signature.shape[0] // bands
    keys = []
    for i in range(bands):
        chunk = signature[i * rows : (i + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes() + bytes([i]), digest_size=8)
        keys.append(int.from_bytes(h.digest(), "little"))
    return keys


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def hash_embedding(text: str, dim: int) -> np.ndarray:
    """Seeded hash-derived unit vector (float32[dim]) — the deterministic
    stand-in for a sentence-embedding model (SURVEY.md §2.3 ST3; the real
    model slot is the actor-pool stage, this is its pure kernel).

    Char 3-grams hashed into ±buckets (feature hashing), L2-normalized.
    """
    v = np.zeros(dim, dtype=np.float64)
    for g in char_shingles(text, 3):
        h = zlib.crc32(g.encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 16) & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token list (document fingerprint / near-dup)."""
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = stable_u64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out
