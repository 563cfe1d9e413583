"""html → text extraction as a vectorized Arrow pandas UDF.

North-rule requirement (BASELINE.json input_hint): byte-identical
extracted text per url versus a PINNED extractor. The container has no
selectolax/bs4, so the pinned extractor is a deterministic pure-Python
parser (regex-free state machine would also work; we use compiled regexes
over whole Series — vectorized at the Arrow batch level, no per-row
Python UDF dispatch).

Semantics (pinned, versioned EXTRACTOR_VERSION):
1. drop <script>...</script> and <style>...</style> blocks (non-greedy)
2. <title> content becomes the first line
3. remaining tags stripped; block-level tags (<p>, <div>, <br>, <li>,
   headings) become newline separators
4. HTML entities &amp; &lt; &gt; &quot; &#39; &nbsp; decoded
5. whitespace normalized per line (collapse runs of the EXPLICIT class
   below — space/tab/\r/\f/\x0B plus NEL/NBSP/LS/PS/ideographic space;
   a newline inside <title> becomes a space), space-trimmed, empty
   lines dropped, lines joined with '\n'

The whitespace class is spelled out because the two engines' escape
shorthands silently differ: Java 8+'s ``\\v`` is the full vertical
class (\\n, NEL, LS, PS) while Python's is \\x0B alone, and Java
``trim`` strips every control char <= U+0020 while ``str.strip()``
strips all Unicode whitespace — either shorthand breaks the pinned
byte-identity between :func:`extract_one` and :func:`extract_text`.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = "1.1.0"

# one explicit inline-whitespace class for BOTH engines (no \v, no \s,
# no bare trim — see module doc). \n is excluded: it is the line
# separator; the title replaces it explicitly.
_WS_CHARS = " \t\r\f\x0b\x85\xa0\u2028\u2029\u3000"

_WS_PAT = "[" + _WS_CHARS + "]+"

_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_TITLE = re.compile(r"(?is)<title\b[^>]*>(.*?)</title\s*>")
_BLOCK = re.compile(r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)\b[^>]*>")
_TAG = re.compile(r"(?s)<[^>]+>")
_WS = re.compile(_WS_PAT)

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&nbsp;": " ",
}

def extract_one(html: bytes | str) -> str:
    """Pinned extractor for a single document (the per-row oracle)."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT.sub(" ", s)
    s = _STYLE.sub(" ", s)
    m = _TITLE.search(s)
    title = m.group(1) if m else ""
    s = _TITLE.sub(" ", s)
    s = _BLOCK.sub("\n", s)
    s = _TAG.sub(" ", s)
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
        title = title.replace(k, v)
    lines = []
    # the title is ONE output line: a newline captured inside <title>
    # becomes a space; strip(" ") not strip() — after the collapse the
    # edges are plain spaces, and bare strip() removes Unicode
    # whitespace Java's engine would keep
    title = _WS.sub(" ", title.replace("\n", " ")).strip(" ")
    if title:
        lines.append(title)
    for line in s.split("\n"):
        line = _WS.sub(" ", line).strip(" ")
        if line:
            lines.append(line)
    return "\n".join(lines)

@pandas_udf(T.StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    # na_action: NULL html must stay NULL (the JVM cascade
    # null-propagates; mapping None into re.sub raises instead)
    return html.map(extract_one, na_action="ignore")

def extract_text_udf(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Pandas-UDF extractor (the pinned per-row oracle). Arrow-batched;
    batch size governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    Prefer :func:`extract_text` (JVM) in pipelines — Python regex per row
    is the slow path and PySpark's local-mode Python runner serializes
    badly at high thread counts."""
    return df.withColumn(out_col, _extract_udf(F.col(html_col)))

def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """JVM extractor: the same pinned semantics as :func:`extract_one`,
    expressed as a regexp_replace/higher-order-function cascade — stays
    inside whole-stage codegen, no Python workers, scan-speed at 100TB.
    Byte-identity vs the Python oracle is pytest-enforced
    (tests/test_text.py::test_sql_extractor_matches_python_oracle).

    Decode is the CAST, not strict decode(): real crawl payloads
    contain malformed UTF-8, and Spark 4 ANSI decode() aborts the whole
    job on the first bad byte (MALFORMED_CHARACTER_CODING). The
    binary→string cast replaces invalid sequences with U+FFFD — the
    same errors='replace' policy extract_one pins on the Python side —
    and is bit-identical to decode() on valid input. Also makes the
    function accept an already-decoded string column (string→string
    cast is a no-op)."""
    s = F.col(html_col).cast("string")
    s = F.regexp_replace(s, r"(?is)<script\b.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style\s*>", " ")
    title = F.regexp_extract(s, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    s = F.regexp_replace(s, r"(?is)<title\b[^>]*>.*?</title\s*>", " ")
    s = F.regexp_replace(
        s, r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)\b[^>]*>", "\n"
    )
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for k, v in _ENTITIES.items():
        s = F.replace(s, F.lit(k), F.lit(v))
        title = F.replace(title, F.lit(k), F.lit(v))
    # space-only edge strip (regexp, not F.trim — Java trim strips every
    # control char <= U+0020, Python's strip(" ") does not)
    def _norm_line(c):
        return F.regexp_replace(
            F.regexp_replace(c, _WS_PAT, " "), r"^ +| +$", ""
        )

    title = _norm_line(F.replace(title, F.lit("\n"), F.lit(" ")))
    lines = F.transform(F.split(s, "\n"), _norm_line)
    body_lines = F.filter(lines, lambda line: F.length(line) > 0)
    all_lines = F.when(F.length(title) > 0, F.concat(F.array(title), body_lines)).otherwise(
        body_lines
    )
    return df.withColumn(out_col, F.array_join(all_lines, "\n"))

def decode_image_stub(df: DataFrame, binary_col: str, out_col: str = "image_features"):
    """Multimodal plumbing: image/audio decode is STUBBED (no PIL/cv2 in
    this container). The Spark-side contract — binary in, fixed-width
    float vector out via mapInPandas — is real; the decode body raises.
    """
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "container; see featurewiz_spark.text.multimodal for the tested "
        "Spark plumbing with a deterministic fake decoder"
    )
