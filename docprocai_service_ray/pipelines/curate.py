"""Training-data curation recipe: the end-to-end composition a pretraining
pipeline runs over a raw document table before anything expensive —
filter → exact dedup → deterministic sample → stats.

This is the flagship COMPOSED pipeline over the existing operator family
(quality gate stages/textstats.py, exact dedup shape stages/dedup.py,
hash sampling stages/sampling.py), and every step is chosen to be exactly
SQL-expressible so the whole recipe stays oracle-checked end to end
(reference analog: the ingest-time gatekeeping the service applies before
embedding, e.g. blank-page suppression DocProcAiService.py:118-140 —
here generalized to corpus curation).

Stage order is load-bearing for scale:

1. quality + lang gate runs per batch FIRST (needs ``text``) and the text
   column is reduced to a 16-byte hash in the same batch — the exchange
   that follows never carries text;
2. exact dedup keeps the min-doc_id row per text hash among SURVIVORS
   (one ``partition_reduce`` on the hash; blake2b-128 collisions are
   negligible, and the SQL oracle groups by the text itself, so a
   collision would be CAUGHT as an oracle mismatch, not hidden);
3. the deterministic md5-prefix sample (stages/sampling.py) is a pure map
   with an exact SQL predicate twin;
4. per-lang stats are a partial+final grouped count/sum.

Zero driver state, one all-to-all total (the dedup exchange, carrying
~40 B/row), sample AFTER dedup so the kept set is stable under re-runs
and under corpus growth of duplicate pages.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import ray.data as rd

from ..stages.sampling import hash_sample, sample_sql_predicate
from ..stages.textstats import quality_score, token_counts

DEFAULT_LANGS = ("en", "de")
DEFAULT_MIN_QUALITY = 0.7
DEFAULT_SAMPLE_RATE = 0.5


def curate_documents(sf_dir: str, *, langs=DEFAULT_LANGS,
                     min_quality: float = DEFAULT_MIN_QUALITY,
                     sample_rate: float = DEFAULT_SAMPLE_RATE,
                     seed: int = 42, num_partitions: int = 16):
    """→ Dataset(doc_id, lang, tok, quality): the curated keep-set."""
    from ..state.groupby import partition_reduce

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    lang_set = set(langs)

    def gate_and_hash(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_score(df["text"])
        keep = df["lang"].isin(lang_set) & (q >= min_quality)
        kept = df[keep]
        return pd.DataFrame(
            {
                "h": kept["text"].fillna("").map(
                    lambda t: hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
                ),
                "doc_id": kept["doc_id"],
                "lang": kept["lang"],
                "tok": token_counts(kept["text"]),
                "quality": q[keep],
            }
        )

    hashed = docs.map_batches(gate_and_hash, batch_format="pandas")

    def keep_min_id(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.sort_values("doc_id")
            .drop_duplicates("h", keep="first")
            .drop(columns="h")
        )

    deduped = partition_reduce(hashed, ["h"], keep_min_id,
                               num_partitions=num_partitions)
    return hash_sample(deduped, "doc_id", sample_rate, seed=seed)


def curated_corpus_stats(sf_dir: str, **kwargs):
    """→ (lang, n_docs, n_tokens): per-language size of the curated set."""
    from ..state.groupby import partition_reduce

    kept = curate_documents(sf_dir, **kwargs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(
            n=("doc_id", "size"), s=("tok", "sum")
        )

    def final(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("lang", as_index=False).agg(
            n_docs=("n", "sum"), n_tokens=("s", "sum")
        )
        return out.astype({"n_docs": "int64", "n_tokens": "int64"})

    return partition_reduce(
        kept.map_batches(partial, batch_format="pandas"), ["lang"], final,
        num_partitions=4,
    )


def curation_sql(langs=DEFAULT_LANGS, min_quality: float = DEFAULT_MIN_QUALITY,
                 sample_rate: float = DEFAULT_SAMPLE_RATE, seed: int = 42) -> str:
    """The DuckDB twin of the WHOLE recipe (same quality formula as
    __ray_entry__._quality_sql, group-by-text dedup with min doc_id, same
    md5 sample predicate) — stats grouped per lang."""
    from ..stages.textstats import _STOPWORDS

    word_re = "[a-zàâäéèêëîïôöùûüß]+"
    en = "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"])) + "]"
    lang_list = ", ".join(f"'{l}'" for l in langs)
    pred = sample_sql_predicate("doc_id", sample_rate, seed=seed)
    return f"""
        WITH d AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents),
        m AS (
            SELECT doc_id, lang, t,
                   len(regexp_extract_all(t, '\\S+')) AS tok,
                   length(t) AS n,
                   len(regexp_extract_all(t, '[.!?,;:]'))::DOUBLE
                       / greatest(length(t), 1) AS pr,
                   len(list_filter(regexp_extract_all(lower(t), '{word_re}'),
                                   x -> list_contains({en}, x)))::DOUBLE
                       / greatest(len(regexp_extract_all(lower(t), '{word_re}')), 1)
                       AS swr
            FROM d
        ),
        q AS (
            SELECT doc_id, lang, t, tok,
                   ROUND(0.4::DOUBLE * (CASE WHEN n BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
                       + 0.3::DOUBLE * (CASE WHEN pr > 0.0 AND pr < 0.2 THEN 1 ELSE 0 END)
                       + 0.3::DOUBLE * (CASE WHEN swr > 0.02 THEN 1 ELSE 0 END), 6) AS q
            FROM m
        ),
        f AS (SELECT * FROM q WHERE lang IN ({lang_list}) AND q >= {min_quality}),
        dd AS (
            SELECT doc_id, lang, tok FROM (
                SELECT f.*, ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
                FROM f) WHERE rn = 1
        ),
        s AS (SELECT * FROM dd WHERE {pred})
        SELECT lang, COUNT(*) AS n_docs, SUM(tok)::BIGINT AS n_tokens
        FROM s GROUP BY lang
    """
