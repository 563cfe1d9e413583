"""Charset-aware transcode of crawled payloads to UTF-8.

Common Crawl is far from all-UTF-8: a large minority of pages declare
(or silently use) legacy encodings — latin-1/windows-1252, shift_jis,
gb2312/gbk, euc-kr, iso-8859-2, … Blind UTF-8 decoding turns those
pages into U+FFFD soup before the extractor ever sees them.

`transcode_to_utf8` resolves each page's charset with the standard
WHATWG-ish precedence and rewrites the payload as UTF-8 bytes:

1. the HTTP ``Content-Type`` charset parameter (the column read_warc
   already extracts),
2. else a ``<meta charset=...>`` / ``http-equiv Content-Type`` sniff
   over the first ``sniff_bytes`` of the payload (spec says the meta
   must appear early; we default 4 KiB),
3. else UTF-8.

Decoding is lenient (``errors='replace'``) — a wrong declaration can't
kill the job — and pages already in UTF-8 (or whose charset resolves to
it) are passed through byte-for-byte. Runs as mapInPandas over Arrow
batches: per-row Python codec work, but this is exactly the
can't-express-in-Catalyst case (Spark has no charset-parametric decode
expression; ANSI ``decode()`` both aborts on malformed input and takes
only a literal charset). One linear pass, no shuffle; the output
column feeds the pinned JVM extractor unchanged.
"""

from __future__ import annotations

import codecs
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# charset tokens seen in the wild -> Python codec names
_ALIASES = {
    "iso-8859-1": "cp1252",  # WHATWG: latin-1 labels mean windows-1252
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "gb2312": "gb18030",  # superset, per WHATWG
    "gbk": "gb18030",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc_kr": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
}

_CT_CHARSET = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
_META_CHARSET = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I
)


def _resolve(label: str | None) -> str | None:
    if not label:
        return None
    name = _ALIASES.get(label.strip().lower(), label.strip().lower())
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_charset(
    content_type: str | None, head: bytes, default: str = "utf-8"
) -> str:
    """HTTP charset param > early <meta> sniff > default."""
    m = _CT_CHARSET.search(content_type) if content_type else None
    cs = _resolve(m.group(1)) if m else None
    if cs is None:
        m2 = _META_CHARSET.search(head)
        if m2:
            cs = _resolve(m2.group(1).decode("latin-1", "replace"))
    return cs or default


def transcode_one(
    payload: bytes, content_type: str | None, sniff_bytes: int = 4096
) -> tuple[bytes, str]:
    """Returns (utf-8 payload bytes, resolved charset name). UTF-8
    input passes through byte-for-byte."""
    cs = detect_charset(content_type, payload[:sniff_bytes])
    if cs == "utf-8":
        return payload, cs
    return payload.decode(cs, errors="replace").encode("utf-8"), cs


def transcode_to_utf8(
    df: DataFrame,
    binary_col: str = "html",
    content_type_col: str = "content_type",
    charset_out: str | None = "charset",
    sniff_bytes: int = 4096,
) -> DataFrame:
    """Rewrite ``binary_col`` in place as UTF-8 bytes, charset resolved
    per row (HTTP param > meta sniff > utf-8). Adds the resolved
    charset name as ``charset_out`` (None to skip). Works on batch and
    streaming DataFrames (stateless map)."""
    from pyspark.sql import types as T

    fields = [
        f for f in df.schema.fields if f.name not in (binary_col, charset_out)
    ]
    out_schema = T.StructType(
        fields + [T.StructField(binary_col, T.BinaryType(), True)]
        + (
            [T.StructField(charset_out, T.StringType(), True)]
            if charset_out
            else []
        )
    )
    other_cols = [f.name for f in fields]

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, charsets = [], []
            for payload, ctype in zip(pdf[binary_col], pdf[content_type_col]):
                if payload is None:
                    payloads.append(None)
                    charsets.append(None)
                    continue
                out, cs = transcode_one(
                    bytes(payload),
                    None if ctype is None else str(ctype),
                    sniff_bytes,
                )
                payloads.append(out)
                charsets.append(cs)
            res = pdf[other_cols].copy()
            res[binary_col] = payloads
            if charset_out:
                res[charset_out] = charsets
            yield res

    return df.mapInPandas(_map, out_schema)
