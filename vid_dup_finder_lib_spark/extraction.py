"""Frozen html -> text extraction.

The per-row invariant from BASELINE.json's input_hint: *byte-identical
extracted text per url*.  This is the analog of the reference's decode step
(ffmpeg frames from bytes, ``ffmpeg_cmdline_utils/src/ffmpeg_ops.rs:21-197``) —
the one stage whose output must be bit-stable across runs and machines,
because every downstream signature is derived from it.

The extractor is therefore a hand-written byte-level state machine with **no
dependency on html parsers, regex engines, locales or unicode tables** — the
exact function is pinned by the test vectors in tests/test_extraction.py and
must never change without bumping SigConfig.fingerprint-relevant versioning.

Semantics (deliberately minimal — the synthetic corpus is generated to match):
* the text is the concatenation of the character data of every ``<p>``
  element inside ``<body>``, in document order, joined with ``"\\n"``;
* nested tags inside a ``<p>`` are stripped (their character data kept);
* the entities ``&amp; &lt; &gt; &quot; &#39;`` are unescaped;
* input is UTF-8 bytes; output is a Python str (decoded with
  errors="replace" so malformed bytes become U+FFFD deterministically).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F

# a complete tag: '<' up to the next '>' (cannot skip a '>', matching the
# original find-based span semantics)
_TAG_RE = re.compile(rb"<[^>]*>")

_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # must be last so "&amp;lt;" -> "&lt;"
]


def extract_text_bytes(html: bytes | None) -> str | None:
    """Frozen extraction. Pure function of the input bytes."""
    if html is None:
        return None
    body_start = html.find(b"<body")
    if body_start == -1:
        return ""
    body_open_end = html.find(b">", body_start)
    if body_open_end == -1:
        return ""
    body_end = html.find(b"</body>", body_open_end)
    if body_end == -1:
        body_end = len(html)
    body = html[body_open_end + 1 : body_end]

    paras: list[bytes] = []
    i = 0
    n = len(body)
    while True:
        p_open = body.find(b"<p", i)
        if p_open == -1:
            break
        p_open_end = body.find(b">", p_open)
        if p_open_end == -1:
            break
        p_close = body.find(b"</p>", p_open_end)
        if p_close == -1:
            p_close = n
        chunk = body[p_open_end + 1 : p_close]
        # strip any nested tags, keep their character data.  One C-speed
        # regex pass (round-2 rewrite of a per-byte Python loop — same
        # frozen semantics; pinned by tests/test_extraction.py vectors).
        # The original loop drops everything from the first *unterminated*
        # '<' onward; such a '<' is exactly one occurring after the last
        # '>', so truncate there before the tag regex.
        if b"<" not in chunk:
            raw = chunk
        else:
            cut = chunk.find(b"<", chunk.rfind(b">") + 1)
            if cut != -1:
                chunk = chunk[:cut]
            raw = _TAG_RE.sub(b"", chunk)
        paras.append(raw)
        i = p_close + 4
    text = b"\n".join(paras)
    # entity unescape over the whole document at once (byte-identical to the
    # original per-paragraph replaces: no pattern contains or produces '\n',
    # so matches never span a paragraph boundary), gated on '&' presence
    if b"&" in text:
        for ent, rep in _ENTITIES:
            text = text.replace(ent, rep)
    return text.decode("utf-8", errors="replace")


def extract_text_arrow(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: adds/overwrites a ``text`` column extracted from
    ``html``.  Used by plans.pipeline when the corpus arrives without the
    pre-extracted text column."""
    for batch in batches:
        html_col = batch.column(batch.schema.get_field_index("html"))
        texts = [extract_text_bytes(v.as_py()) for v in html_col]
        arrays = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        arrays["text"] = pa.array(texts, type=pa.string())
        yield pa.RecordBatch.from_pydict(arrays)


def extract_text_col(html: Column) -> Column:
    """Arrow-vectorized column form of the frozen extractor."""

    @F.pandas_udf("string")
    def extract_text_udf(h: pd.Series) -> pd.Series:
        return h.map(extract_text_bytes)

    return extract_text_udf(html)
