"""Unit tests for the pure kernels (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import numpy as np
import pytest

from docprocai_service_ray.functions.canon import (
    UnionFind,
    bucket_candidate_pairs,
    canonical_id_for_component,
    lsh_candidate_edges,
    qid_node,
)
from docprocai_service_ray.functions.hashing import (
    band_keys,
    char_shingles,
    hash_embedding,
    jaccard,
    minhash_params,
    minhash_signature,
    simhash64,
    surface_shingle_hashes,
)
from docprocai_service_ray.functions.html_extract import content_hash, extract_text
from docprocai_service_ray.functions.sentences import split_sentences
from docprocai_service_ray.functions.triples import SENTENCE_PATTERN, extract_triples


class TestExtractText:
    def test_strips_boilerplate(self):
        html = (
            b"<html><head><title>T</title><style>a{}</style></head><body>"
            b"<nav>Home About</nav><div><h1>Hello</h1><p>World one.</p></div>"
            b"<footer>foot</footer><script>x()</script></body></html>"
        )
        assert extract_text(html) == "Hello\nWorld one."

    def test_empty_and_none(self):
        assert extract_text(b"") == ""
        assert extract_text(None) == ""

    def test_boilerplate_only_is_empty(self):
        html = b"<html><body><nav>Home</nav><footer>f</footer></body></html>"
        assert extract_text(html) == ""

    def test_non_utf8_deterministic(self):
        raw = b"\xff\xfe\x00<p>Broken Bytes Remain</p>\x80\x81"
        out1, out2 = extract_text(raw), extract_text(bytes(raw))
        assert out1 == out2
        assert "Broken Bytes Remain" in out1

    def test_inline_tags_do_not_break_lines(self):
        assert extract_text(b"<p>a <b>bold</b> word</p>") == "a bold word"

    def test_whitespace_collapsed(self):
        assert extract_text(b"<p>a\n   b\t c</p>") == "a b c"

    def test_content_hash_stable(self):
        assert content_hash("abc") == content_hash("abc")
        assert content_hash("abc") != content_hash("abd")
        assert len(content_hash("x")) == 16


class TestSentences:
    def test_basic_split_with_offsets(self):
        text = "One fine day. Another one! Third?"
        sents = split_sentences(text)
        assert [s[1] for s in sents] == ["One fine day.", "Another one!", "Third?"]
        for _, s, a, b in sents:
            assert text[a:b] == s

    def test_newlines_split(self):
        sents = split_sentences("Title line\nBody sentence.")
        assert [s[1] for s in sents] == ["Title line", "Body sentence."]

    def test_empty(self):
        assert split_sentences("") == []
        assert split_sentences("   \n  ") == []

    def test_ids_sequential(self):
        sents = split_sentences("A. B. C.")
        assert [s[0] for s in sents] == [0, 1, 2]


class TestTriples:
    def test_simple_fact(self):
        out = extract_triples("Alice Turner works for Blue River Labs.")
        assert len(out) == 1
        subj, pred, obj = out[0][:3]
        assert (subj, pred, obj) == ("Alice Turner", "works_for", "Blue River Labs")

    def test_spans_index_into_sentence(self):
        s = "Alice Turner founded Vega Core Corp in 2001."
        (subj, pred, obj, ss, sl, os_, ol, conf) = extract_triples(s)[0]
        assert s[ss : ss + sl] == subj
        assert s[os_ : os_ + ol] == obj

    def test_no_match_on_filler(self):
        assert extract_triples("The weather stayed mild through the quarter.") == []
        assert extract_triples("Nobody founded anything during the recess.") == []
        assert extract_triples("Analysts who works for nobody were not consulted.") == []

    def test_trailing_year_clause(self):
        out = extract_triples("Mona Zhou was born in Corvan in 1990.")
        assert out[0][:3] == ("Mona Zhou", "born_in", "Corvan")

    def test_longest_phrase_wins(self):
        # "is the CEO of" must not partially match some shorter phrase
        out = extract_triples("Hugo Castro is the CEO of Atlas Grid Group.")
        assert out[0][1] == "ceo_of"


class TestHashing:
    def test_minhash_deterministic_under_seed(self):
        a, b = minhash_params(32, 42)
        a2, b2 = minhash_params(32, 42)
        assert np.array_equal(a, a2) and np.array_equal(b, b2)
        h = surface_shingle_hashes("blue river labs", 3)
        assert np.array_equal(minhash_signature(h, a, b), minhash_signature(h, a, b))

    def test_minhash_seed_changes_signature(self):
        a, b = minhash_params(32, 42)
        a3, b3 = minhash_params(32, 43)
        h = surface_shingle_hashes("blue river labs", 3)
        assert not np.array_equal(minhash_signature(h, a, b), minhash_signature(h, a3, b3))

    def test_band_keys_count(self):
        a, b = minhash_params(32, 42)
        sig = minhash_signature(surface_shingle_hashes("abcdef", 3), a, b)
        assert len(band_keys(sig, 16)) == 16

    def test_similar_surfaces_share_bands(self):
        a, b = minhash_params(32, 42)
        s1 = minhash_signature(surface_shingle_hashes("blue river laboratories", 3), a, b)
        s2 = minhash_signature(surface_shingle_hashes("blueriver laboratories", 3), a, b)
        assert set(band_keys(s1, 16)) & set(band_keys(s2, 16))

    def test_hash_embedding_unit_norm(self):
        v = hash_embedding("Alice Turner", 64)
        assert v.dtype == np.float32
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    def test_jaccard(self):
        assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)
        assert jaccard(set(), set()) == 1.0
        assert jaccard({1}, set()) == 0.0

    def test_simhash_similar_docs_close(self):
        a = simhash64("the quick brown fox jumps over the lazy dog".split())
        b = simhash64("the quick brown fox jumps over the lazy cat".split())
        c = simhash64("completely different words entirely here now".split())
        assert bin(a ^ b).count("1") < bin(a ^ c).count("1")

    def test_char_shingles_short_string(self):
        assert char_shingles("ab", 3) == ["ab"]
        assert char_shingles("", 3) == []


class TestCanon:
    def test_union_find_min_label(self):
        uf = UnionFind()
        uf.union("b", "c")
        uf.union("a", "b")
        assert uf.find("c") == "a"

    def test_bucket_pairs_small_all_pairs(self):
        assert bucket_candidate_pairs(["b", "a", "c"]) == [("a", "b"), ("a", "c"), ("b", "c")]

    def test_bucket_pairs_large_chain(self):
        ss = [f"s{i:03d}" for i in range(60)]
        pairs = bucket_candidate_pairs(ss, pair_cap=50)
        assert len(pairs) == 59  # star keeps connectivity, bounds work, diameter 2

    def test_canonical_id_prefers_min_qid_numeric(self):
        assert canonical_id_for_component([qid_node("Q10"), qid_node("Q9"), "x"]) == "Q9"
        cid = canonical_id_for_component(["zeta", "alpha"])
        assert cid.startswith("C")

    def test_lsh_edges_deterministic(self):
        surfaces = ["blue river labs", "blue river laboratories", "unrelated thing"]
        kw = dict(seed=42, num_perms=32, bands=16, k=3, threshold=0.5)
        assert lsh_candidate_edges(surfaces, **kw) == lsh_candidate_edges(surfaces, **kw)
