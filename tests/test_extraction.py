"""Extraction invariant vectors (FIXTURES.md §5): the frozen html->text
function must reproduce the expected text byte-for-byte.

Analog of the reference's pinned behaviors around decode
(ffmpeg_cmdline_utils); the per-row invariant from BASELINE.json input_hint.
"""

import pytest

from vid_dup_finder_lib_spark.extraction import extract_text_bytes

VECTORS = [
    # (html, expected_text)
    (b"<html><head><title>t</title></head><body></body></html>", ""),  # empty body
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (
        b"<html><body><p>one</p><p>two</p><p>three</p></body></html>",
        "one\ntwo\nthree",
    ),  # multi-paragraph
    (
        b"<html><body><p>a <b>bold</b> word</p></body></html>",
        "a bold word",
    ),  # nested tags stripped
    (
        b"<html><body><p>x &amp; y &lt;z&gt;</p></body></html>",
        "x & y <z>",
    ),  # entities
    (
        b"<html><body><p>\xc3\xa9l\xc3\xa8ve \xe6\x97\xa5\xe6\x9c\xac</p></body></html>",
        "élève 日本",
    ),  # non-ASCII UTF-8
    (
        b"<html><body>\r\n<p>line1</p>\r\n<p>line2</p>\r\n</body></html>",
        "line1\nline2",
    ),  # CRLF between paragraphs ignored
    (b"", ""),  # no body at all
    (b"<html><body><p>tail", "tail"),  # unclosed <p>
    (
        b"<html><body><p>&amp;amp;</p></body></html>",
        "&amp;",
    ),  # &amp; unescaped last: no double-unescape
]


@pytest.mark.parametrize("html,expected", VECTORS)
def test_vector(html, expected):
    assert extract_text_bytes(html) == expected


def test_null():
    assert extract_text_bytes(None) is None


def test_deterministic():
    h = b"<html><body><p>a</p><p>b</p></body></html>"
    assert extract_text_bytes(h) == extract_text_bytes(h) == "a\nb"


# -- robustness: the frozen extractor is total over arbitrary bytes ---------

import hypothesis.strategies as st
from hypothesis import given, settings


@settings(max_examples=300, deadline=None)
@given(
    st.binary(max_size=400)
    | st.text(
        alphabet="<>&;ab \n\t" + "\x0b" + "pbody/=\"'&amp;&lt;🦀", max_size=300
    ).map(lambda s: s.encode("utf-8"))
)
def test_extractor_total_and_deterministic(data):
    """Never raises on arbitrary byte soup; pure function of its input."""
    from vid_dup_finder_lib_spark.extraction import extract_text_bytes

    a = extract_text_bytes(data)
    b = extract_text_bytes(data)
    assert a == b
    assert isinstance(a, str)
