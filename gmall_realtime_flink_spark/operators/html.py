"""HTML boilerplate removal (beyond-reference): the WARC→text main-
content extraction stage every web-scrape training pipeline runs
before any text filter (C4's and RefinedWeb's first step).

`extract_main_text` is a jusText-style block classifier over a REAL
HTML parse (stdlib `html.parser`, entity-aware): per block element it
measures text length and LINK DENSITY (characters inside <a> vs
total) and keeps blocks that are long enough and link-sparse —
dropping navigation, footers and tag-clouds, which are short and/or
link-saturated. Two rules only (length >= MIN_BLOCK_CHARS, link
density <= 1/2, both integer-exact) so the DuckDB oracle can
recompute the verdicts symbolically from the staged page structure.

`attach_html_payload` stages a deterministic page per document: a
link-saturated <nav>, the document's words distributed round-robin
over N content paragraphs (the first optionally carrying an inline
<a> around its first word — link-sparse, must be KEPT with the link
text included), an always-too-short tag-cloud block, and a
link-saturated <footer>. Entities are escaped on generation and
unescaped by the parser, so hostile corpora with &, <, > in the text
round-trip exactly.

Scale: Arrow mapInPandas, narrow, no shuffle — extraction cost is
O(page bytes) per row and embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
import html as _html
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

MIN_BLOCK_CHARS = 20
_BLOCK_TAGS = {"p", "nav", "footer", "div", "li", "h1", "h2", "h3"}


class _BlockCollector(HTMLParser):
    """Flat block-level text collector: accumulates text per block
    element and tracks how many of its characters sit inside <a>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._text: list[str] = []
        self._link_chars = 0
        self._in_block = False
        self._in_a = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            if self._in_block:
                self._flush()
            self._in_block = True
        elif tag == "a":
            self._in_a += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
            self._in_block = False
        elif tag == "a" and self._in_a:
            self._in_a -= 1

    def handle_data(self, data: str) -> None:
        if self._in_block and data:
            self._text.append(data)
            if self._in_a:
                self._link_chars += len(data)

    def _flush(self) -> None:
        text = "".join(self._text)
        if text or self._link_chars:
            self.blocks.append((text, self._link_chars))
        self._text = []
        self._link_chars = 0


def extract_blocks(page: str) -> list[tuple[str, int]]:
    """Parse HTML and return (block_text, link_chars) per block
    element, in document order."""
    c = _BlockCollector()
    c.feed(page)
    c.close()
    if c._in_block:
        c._flush()
    return c.blocks


def classify_blocks(
    blocks: list[tuple[str, int]],
    min_chars: int = MIN_BLOCK_CHARS,
) -> list[str]:
    """The two jusText-lite rules, integer-exact: keep iff
    len(text) >= min_chars AND link_chars * 2 <= len(text)."""
    return [
        t
        for t, lc in blocks
        if len(t) >= min_chars and lc * 2 <= len(t)
    ]


def _page_params(doc_id: int, text: str) -> dict:
    p = 32 + hashlib.md5(text.encode("utf-8")).digest()[0] % 95
    return {"p": p, "n_paras": 1 + p % 4, "inline_link": p % 2 == 0}


def build_page(doc_id: int, text: str) -> str:
    """Deterministic staged page: nav (all-link), the doc's
    whitespace words round-robin over n_paras <p> blocks (paragraph
    i takes words i, i+n, i+2n, ...; the first paragraph optionally
    wraps its first word in <a>), a too-short tag-cloud block, and
    an all-link footer."""
    import re

    m = _page_params(doc_id, text)
    # ASCII \s+ split, matching the oracle's RE2 semantics (Python's
    # default str.split also breaks on unicode whitespace — RE2's \s
    # does not)
    words = [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]
    paras = [words[i :: m["n_paras"]] for i in range(m["n_paras"])]
    out = [
        "<html><body>",
        '<nav><a href="/">home</a><a href="/about">about us</a>'
        '<a href="/contact">contact page</a></nav>',
    ]
    for i, pw in enumerate(paras):
        esc = [_html.escape(w) for w in pw]
        if i == 0 and m["inline_link"] and esc:
            body = "<a href=\"#\">" + esc[0] + "</a>"
            if esc[1:]:
                body += " " + " ".join(esc[1:])
        else:
            body = " ".join(esc)
        out.append(f"<p>{body}</p>")
    out.append("<p>tag cloud</p>")
    out.append(
        '<footer><a href="/terms">terms of service</a>'
        '<a href="/privacy">privacy policy</a></footer>'
    )
    out.append("</body></html>")
    return "".join(out)


def attach_html_payload(docs: DataFrame) -> DataFrame:
    """Stage HTML pages for every doc (NULL text -> NULL page)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pages = [
                None if text is None else build_page(int(doc_id), text)
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "page": pages})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, page string"
    )


HTML_EXTRACT_SCHEMA = (
    "doc_id long, n_blocks int, n_kept int, kept_chars long, "
    "extracted_md5 string"
)


def extract_main_text(with_page: DataFrame) -> DataFrame:
    """Per-doc main-content extraction: real HTML parse, block
    classification, and the md5 of the newline-joined kept blocks as
    the hash surface — a mis-parsed entity, a link-density slip or a
    dropped/kept block anywhere changes it."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "n_blocks", "n_kept", "kept_chars",
                    "extracted_md5",
                )
            }
            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                rows["doc_id"].append(doc_id)
                if page is None:
                    for k in list(rows)[1:]:
                        rows[k].append(None)
                    continue
                blocks = extract_blocks(page)
                kept = classify_blocks(blocks)
                joined = "\n".join(kept)
                rows["n_blocks"].append(len(blocks))
                rows["n_kept"].append(len(kept))
                rows["kept_chars"].append(
                    sum(len(t) for t in kept)
                )
                rows["extracted_md5"].append(
                    hashlib.md5(joined.encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "n_blocks": pd.Series(rows["n_blocks"], dtype="Int32"),
                    "n_kept": pd.Series(rows["n_kept"], dtype="Int32"),
                    "kept_chars": pd.Series(
                        rows["kept_chars"], dtype="Int64"
                    ),
                    "extracted_md5": pd.Series(
                        rows["extracted_md5"], dtype="object"
                    ),
                }
            )

    return with_page.mapInPandas(gen, schema=HTML_EXTRACT_SCHEMA)
