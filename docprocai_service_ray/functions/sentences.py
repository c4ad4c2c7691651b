"""Sentence segmentation (the M4 analog).

Order-dependent *within one document*, independent *across* documents —
exactly the shape of the reference's caption-merge video segmentation
(reference: fileextractlib/VideoProcessor.py:92-174, a sequential scan
over one video's frames). A whole document's text is one row, so the scan
never crosses block boundaries (SURVEY.md §2.2 M4, §2.8).

``sent_id`` is assigned by character offset (stable under any
parallelism); char_start/char_end index into the extracted doc text so
``text[char_start:char_end] == sentence`` holds exactly.
"""

from __future__ import annotations

import re

# End-of-sentence: terminal punctuation followed by whitespace, or a newline
# (extraction emits one line per block element), or end-of-text.
_SENT_BREAK = re.compile(r"(?<=[.!?])[ \t]+|\n+")


def split_sentences(text: str) -> list[tuple[int, str, int, int]]:
    """Return [(sent_id, sentence_text, char_start, char_end)].

    Offsets are into ``text``; sentences are the exact substrings (no
    stripping beyond the split itself), empty segments dropped.
    """
    if not text:
        return []
    out: list[tuple[int, str, int, int]] = []
    pos = 0
    sent_id = 0
    for m in _SENT_BREAK.finditer(text):
        seg = text[pos : m.start()]
        if seg.strip():
            out.append((sent_id, seg, pos, m.start()))
            sent_id += 1
        pos = m.end()
    seg = text[pos:]
    if seg.strip():
        out.append((sent_id, seg, pos, len(text)))
    return out
