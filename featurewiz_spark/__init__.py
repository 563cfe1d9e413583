"""featurewiz_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the semantics of AutoViML/featurewiz (reference at
/root/reference, a single-process pandas library) as idiomatic Spark:
DataFrame/SQL declarative plans optimized by Catalyst, window functions for
the temporal core, broadcast joins for dimension merge-backs, and
Arrow-vectorized pandas UDFs only where built-ins cannot express the
semantics (html→text extraction, per-group merge_asof fallback).

The north-rule workload is a point-in-time / as-of join + windowed feature
pipeline (backfill, lag/lead, rolling, sessionize) over Common-Crawl-style
page tables ``(url, warc_ts, html, text, lang)`` at 10^12-document scale,
plus featurewiz's SULOV correlation pruning and recursive importance-voting
feature ranking re-derived as distributed transforms.

Design stance (SURVEY.md §7.0): every operator is a pure function
``DataFrame -> DataFrame`` plus, for fitted transformers, a small
driver-side state object that is broadcast-joined back. No RDD API, no
custom Catalyst rules; determinism via fixed seeds, pinned reference
dates, and explicit tie-breakers.
"""

from featurewiz_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
