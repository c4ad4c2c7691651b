"""Property-based tests (hypothesis) for the pure kernels — SURVEY.md §5.2
item 4: determinism and structural invariants under arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docprocai_service_ray.functions.hashing import (
    jaccard,
    minhash_params,
    minhash_signature,
    surface_shingle_hashes,
)
from docprocai_service_ray.functions.html_extract import extract_text
from docprocai_service_ray.functions.sentences import split_sentences
from docprocai_service_ray.functions.triples import extract_triples


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_extract_deterministic_on_arbitrary_bytes(raw):
    """Any byte string extracts without raising and byte-identically."""
    assert extract_text(raw) == extract_text(bytes(raw))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2000))
def test_sentences_offsets_are_exact(text):
    for sent_id, s, a, b in split_sentences(text):
        assert text[a:b] == s
        assert s.strip()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2000))
def test_sentence_ids_dense_and_ordered(text):
    sents = split_sentences(text)
    assert [s[0] for s in sents] == list(range(len(sents)))
    starts = [s[2] for s in sents]
    assert starts == sorted(starts)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_triples_never_raise_and_spans_valid(sentence):
    for subj, pred, obj, ss, sl, os_, ol, conf in extract_triples(sentence):
        assert sentence[ss : ss + sl] == subj
        assert sentence[os_ : os_ + ol] == obj
        assert 0.0 <= conf <= 1.0


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=80), st.integers(min_value=0, max_value=2**31))
def test_minhash_process_independent(surface, seed):
    """Signature depends only on (surface, seed) — never on ambient state."""
    a, b = minhash_params(16, seed)
    s1 = minhash_signature(surface_shingle_hashes(surface, 3), a, b)
    a2, b2 = minhash_params(16, seed)
    s2 = minhash_signature(surface_shingle_hashes(surface, 3), a2, b2)
    assert (s1 == s2).all()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(), max_size=50), st.sets(st.integers(), max_size=50))
def test_jaccard_bounds_and_symmetry(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    if a == b:
        assert j == 1.0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=30), max_size=20), st.data())
def test_extraction_html_wrapper_roundtrip(lines, data):
    """Text wrapped in <p> blocks (no markup chars) survives extraction as
    those exact lines, whitespace-normalized."""
    clean = [" ".join(l.split()) for l in lines]
    clean = [l for l in clean if l and "<" not in l and ">" not in l and "&" not in l]
    html = ("<html><body><nav>skip me</nav>" +
            "".join(f"<p>{l}</p>" for l in clean) +
            "<footer>skip</footer></body></html>").encode()
    assert extract_text(html).split("\n") == (clean if clean else [""])


@settings(max_examples=25, deadline=None)
@given(
    st.integers(4, 40), st.integers(4, 40), st.integers(0, 10_000),
    st.sampled_from([60, 80, 95]),
)
def test_jpeg_roundtrip_bounded_error_any_shape(h, w, seed, quality):
    """Arbitrary-sized random images survive the JPEG round trip with
    bounded error and exact dimensions (functions/jpegcodec.py)."""
    import numpy as np

    from docprocai_service_ray.functions.jpegcodec import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(seed)
    # smooth field (JPEG's design domain) + a hard edge
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)),
         ((xx + yy) * 127 // max(h + w - 2, 1))], axis=-1,
    ).astype(np.uint8)
    img[: h // 2, : w // 2] = rng.randint(0, 256, 3)
    dec = jpeg_decode(jpeg_encode(img, quality=quality))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    # tiny images are one mostly-padded 8×8 block — random content there
    # quantizes harder, so the bound loosens below one full block
    lo = 18 if quality == 60 else 10
    assert err < (lo + 4 if min(h, w) < 8 else lo)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 10_000),
       st.integers(2, 32))
def test_gif_roundtrip_exact_any_shape(h, w, seed, ncolors):
    """GIF is lossless on palette images: exact pixels at any size/palette."""
    import numpy as np

    from docprocai_service_ray.functions import mediacodec as mc

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.randint(0, ncolors, (h, w)).astype(np.uint8)
    assert np.array_equal(mc.gif_decode(mc.gif_encode(idx, pal)), pal[idx])
