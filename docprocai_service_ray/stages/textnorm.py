"""Unicode/whitespace text normalization — the cleanup pass C4/CCNet
run before anything hashes or tokenizes (Raffel et al. 2020 §2.2 strip
boilerplate lines and bad unicode; CCNet normalizes before dedup so
byte-variant duplicates collide). Three ordered steps, each mirrored
verbatim in the DuckDB twin:

1. NFC unicode normalization (composed form — é as one codepoint), via
   ``unicodedata.normalize`` / DuckDB ``nfc_normalize``;
2. control-character strip (C0/C1 except ``\\t`` ``\\n`` ``\\r``, plus
   zero-width chars U+200B-200D and U+FEFF — the copy-paste artifacts);
3. whitespace collapse: runs of whitespace → one space, then trim.

Pure map, zero exchange. Run BEFORE url/line/span dedup so equivalent
byte variants produce equal hashes — the reason this op exists.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# RE2-safe classes shared verbatim with the SQL twin. The whitespace
# class is EXPLICIT (ASCII ws + NBSP) because Python's \s is
# unicode-aware while RE2's is ASCII-only — a shared \s would silently
# diverge on NBSP-bearing web text.
_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F​-‍﻿]"
_WS_RE = "[ \t\n\r\f\v ]+"


def normalize_text_series(texts: pd.Series) -> pd.Series:
    t = texts.fillna("").map(lambda s: unicodedata.normalize("NFC", s))
    t = t.str.replace(_CTRL_RE, "", regex=True)
    # after the collapse, edges hold at most one ASCII space — strip
    # spaces only so trim() matches exactly
    return t.str.replace(_WS_RE, " ", regex=True).str.strip(" ")


def normalize_text(ds, text_col: str, *, out_col: str | None = None):
    """Append (or replace) the normalized text column. Pure map."""
    dst = out_col or text_col

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[dst] = normalize_text_series(df[text_col])
        return df

    return ds.map_batches(fn, batch_format="pandas")


def normalize_text_sql(expr: str) -> str:
    """DuckDB expression chain matching :func:`normalize_text_series`."""
    e = f"nfc_normalize(coalesce({expr}, ''))"
    e = f"regexp_replace({e}, '{_CTRL_RE}', '', 'g')"
    return f"trim(regexp_replace({e}, '{_WS_RE}', ' ', 'g'))"
