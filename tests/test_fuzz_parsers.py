"""Adversarial-bytes fuzz for the stdlib parsers (WARC / xlsx / CDX):
lenient mode must terminate without raising on ANY corruption — crawl
archives contain garbage, and one bad file must never kill a
1000-executor job. Hypothesis drives deterministic byte mutations."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from featurewiz_spark.sources.warc import _split_http_payload, iter_warc_records
from tests.test_warc import _http, _record

_BASE = (
    _record("response", "http://f.example/a", "2024-01-01T00:00:00Z",
            _http(b"<p>base</p>"))
    + _record("resource", "http://f.example/b", "2024-01-02T00:00:00Z",
              b"raw payload")
)


@settings(max_examples=60, deadline=None)
@given(
    pos=st.integers(0, len(_BASE) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_BASE)),
)
def test_warc_lenient_never_raises_on_mutation(pos, val, cut):
    data = bytearray(_BASE[:cut] or _BASE)
    if pos < len(data):
        data[pos] = val
    recs = list(iter_warc_records(io.BytesIO(bytes(data))))
    assert len(recs) <= 2  # can only lose records, never invent them


@settings(max_examples=40, deadline=None)
@given(blob=st.binary(min_size=0, max_size=400))
def test_http_split_never_raises(blob):
    body, ctype, status = _split_http_payload(b"HTTP/1.1 " + blob)
    assert isinstance(body, bytes)
    body2, _, _ = _split_http_payload(blob)
    assert isinstance(body2, bytes)


@settings(max_examples=30, deadline=None)
@given(
    corrupt_part=st.sampled_from(
        ["xl/workbook.xml", "xl/worksheets/sheet1.xml", "xl/sharedStrings.xml"]
    ),
    payload=st.binary(min_size=0, max_size=120),
)
def test_xlsx_stdlib_bounded_failure(tmp_path_factory, corrupt_part, payload):
    """Corrupt workbooks raise a PARSE error (ValueError/XML/zip) —
    never hang, never return garbage silently as success with wrong
    shape (a parse that does succeed must still be a DataFrame)."""
    import xml.etree.ElementTree as ET

    import pandas as pd

    from featurewiz_spark.sources.readers import _read_xlsx_stdlib
    from tests.test_sources import _write_minimal_xlsx

    d = tmp_path_factory.mktemp("fuzz_xlsx")
    p = str(d / "t.xlsx")
    _write_minimal_xlsx(p)
    # rewrite one part with fuzz bytes
    src = zipfile.ZipFile(p)
    names = src.namelist()
    p2 = str(d / "t2.xlsx")
    with zipfile.ZipFile(p2, "w") as out:
        for n in names:
            out.writestr(n, payload if n == corrupt_part else src.read(n))
    src.close()
    try:
        pdf = _read_xlsx_stdlib(p2)
        assert isinstance(pdf, pd.DataFrame)
    except (ValueError, KeyError, IndexError, ET.ParseError,
            zipfile.BadZipFile):
        pass  # bounded, typed failure


@settings(max_examples=40, deadline=None)
@given(line=st.text(max_size=200))
def test_cdx_single_line_never_crashes(line):
    """Driver-side replica of the CDX projection semantics: any input
    line either parses to the 3-part shape or is dropped — mirrored by
    construction; here we only pin that the validity regex itself is
    total (no catastrophic backtracking — RE2-safe patterns)."""
    import re

    from featurewiz_spark.sources.cdx import JSON_PAT, TS_PAT, URLKEY_PAT

    for pat in (URLKEY_PAT, TS_PAT, JSON_PAT):
        re.search(pat, line)  # must terminate quickly for ANY input
