"""HTML → text extraction (the M1 analog).

Pure, deterministic, per-row: byte-identical output for a given ``html``
input regardless of batch composition, partitioning or parallelism — the
per-row invariant from BASELINE.json ``input_hint``. This is the target
analog of the reference's per-page PDF text extraction
(reference: fileextractlib/PdfProcessor.py:23-65 — Tika extract, strip,
drop empty pages), re-expressed as trafilatura-style boilerplate removal
implemented on the stdlib ``html.parser`` (no external deps, fully
deterministic).

Rules:
- content inside SKIP_TAGS (script/style/nav/footer/... boilerplate
  containers) is dropped entirely, at any nesting depth;
- block-level tags introduce line breaks; inline tags do not;
- whitespace inside a line collapses to single spaces; blank lines drop;
- bytes decode as UTF-8 with ``errors="replace"`` (deterministic for
  non-UTF8 inputs);
- empty/boilerplate-only pages extract to ``""`` (callers drop them, the
  analog of the reference's empty-page skip, PdfProcessor.py:53-59).
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser

# Boilerplate containers whose entire subtree is dropped.
SKIP_TAGS = frozenset(
    {
        "script",
        "style",
        "nav",
        "footer",
        "header",
        "aside",
        "noscript",
        "template",
        "form",
        "iframe",
        "svg",
        "head",
    }
)

# Tags that terminate/open a text line.
BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "ul",
        "ol",
        "table",
        "tr",
        "td",
        "th",
        "blockquote",
        "pre",
        "br",
        "hr",
        "title",
        "body",
        "html",
    }
)

# Void elements never push onto the open-tag stack.
_VOID = frozenset({"br", "hr", "img", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []  # flat stream of text chunks and "\n" markers

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in SKIP_TAGS and tag not in _VOID:
            self._skip_depth += 1
            return
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS and tag not in _VOID:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._parts.append(data)

    def text(self) -> str:
        lines: list[str] = []
        current: list[str] = []
        for part in self._parts:
            if part == "\n":
                line = " ".join("".join(current).split())
                if line:
                    lines.append(line)
                current = []
            else:
                current.append(part)
        line = " ".join("".join(current).split())
        if line:
            lines.append(line)
        return "\n".join(lines)


def extract_text_str(raw: str) -> str:
    """Extract visible text from an ALREADY-DECODED html string — callers
    that need the decoded string for other per-row work (e.g. the fused
    href extraction in stages/extract.extract_batch_links) decode once and
    share it. ``extract_text(b) == extract_text_str(b.decode("utf-8",
    errors="replace"))`` by construction, preserving the byte-identical
    per-url invariant."""
    parser = _TextExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        # html.parser is tolerant; any residual parse error yields whatever
        # text was accumulated — still deterministic for identical bytes.
        pass
    return parser.text()


def extract_text(html: bytes | None) -> str:
    """Extract visible text from raw HTML bytes. Pure and deterministic."""
    if not html:
        return ""
    return extract_text_str(html.decode("utf-8", errors="replace"))


def content_hash(text: str) -> bytes:
    """16-byte stable content hash (blake2b) of extracted text."""
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).digest()
