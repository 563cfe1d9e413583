"""Column taxonomy + problem typing (SURVEY.md §1.2, §1.3, §2.4 A13).

The reference's `classify_columns` (featurewiz/classify_method.py:54-319)
walks columns one by one with pandas ops on a ≤10k sample. Spark-first:
ONE profiling aggregate computes every signal for every column in a
single job (count, nulls, distinct, min/max, mean length, max length,
inf count, variance), then the 11-way classification is pure driver
logic over that tiny stats table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CAT_LIMIT = 35  # reference classify_method.py:75
FLOAT_CAT_LIMIT = 15  # reference classify_method.py:76 (float_limit)
NLP_MIN_STRLEN = 50  # reference classify_method.py:122-125
DISCRETE_MIN_MEAN_STRLEN = 30  # reference classify_method.py:126-133
NULL_DELETE_FRAC = 0.90  # reference classify_method.py:83-84


@dataclass
class ColumnProfile:
    name: str
    dtype: str
    n: int
    n_null: int
    n_distinct: int
    mean_len: float | None = None
    max_len: int | None = None
    n_inf: int = 0
    variance: float | None = None


@dataclass
class ColumnTaxonomy:
    """The reference's 11 disjoint classes (classify_method.py:54-319)."""

    cols_delete: list[str] = field(default_factory=list)
    string_bool_vars: list[str] = field(default_factory=list)
    num_bool_vars: list[str] = field(default_factory=list)
    nlp_vars: list[str] = field(default_factory=list)
    discrete_string_vars: list[str] = field(default_factory=list)
    id_vars: list[str] = field(default_factory=list)
    date_vars: list[str] = field(default_factory=list)
    int_vars: list[str] = field(default_factory=list)
    cat_vars: list[str] = field(default_factory=list)
    continuous_vars: list[str] = field(default_factory=list)

    def asdict(self) -> dict[str, list[str]]:
        return dict(self.__dict__)


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> dict[str, ColumnProfile]:
    """One aggregate job → per-column stats. approx_count_distinct keeps
    this a single pass at any scale (the reference samples to 10k rows;
    we profile everything, exactly where exact counts are cheap)."""
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = schema[c]
        aggs.append(F.count(F.when(F.isnull(F.col(c)), 1)).alias(f"{c}__null"))
        aggs.append(F.approx_count_distinct(c, rsd=0.01).alias(f"{c}__dist"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"{c}__mlen"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__xlen"))
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            aggs.append(
                F.count(
                    F.when(F.col(c).isin(float("inf"), float("-inf")), 1)
                ).alias(f"{c}__inf")
            )
        if isinstance(dt, _NUMERIC):
            aggs.append(F.variance(F.col(c).cast("double")).alias(f"{c}__var"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    out = {}
    for c in cols:
        dt = schema[c]
        out[c] = ColumnProfile(
            name=c,
            dtype=dt.simpleString(),
            n=n,
            n_null=row[f"{c}__null"],
            n_distinct=row[f"{c}__dist"],
            mean_len=row.asDict().get(f"{c}__mlen"),
            max_len=row.asDict().get(f"{c}__xlen"),
            n_inf=row.asDict().get(f"{c}__inf", 0) or 0,
            variance=row.asDict().get(f"{c}__var"),
        )
    return out


def classify_columns(
    df: DataFrame, target: str | list[str] | None = None, cat_limit: int = CAT_LIMIT
) -> ColumnTaxonomy:
    """Reference classify_columns semantics on Spark profiles
    (featurewiz/classify_method.py:54-319; rules cited per branch).

    Differences from the reference, by design: Spark schemas are typed,
    so mixed-dtype detection (classify_method.py:86-89) is impossible by
    construction, and TimestampType is authoritative for dates.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    targets = (
        [] if target is None else [target] if isinstance(target, str) else list(target)
    )
    cols = [c for c in df.columns if c not in targets]
    profs = profile_columns(df, cols)
    tx = ColumnTaxonomy()
    for c in cols:
        p = profs[c]
        dt = schema[c]
        nn = p.n - p.n_null
        # cols_delete: single-valued or ≥90% null or any ±inf
        # (classify_method.py:83-90)
        if nn == 0 or p.n_distinct <= 1 or p.n_null >= NULL_DELETE_FRAC * p.n or p.n_inf > 0:
            tx.cols_delete.append(c)
            continue
        # TimestampNTZType is a distinct class from TimestampType —
        # omitting it silently sent NTZ columns (the parquet default for
        # naive timestamps) to cols_delete via the unknown-type fallthrough
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            tx.date_vars.append(c)  # classify_method.py:161-163
            continue
        if isinstance(dt, T.BooleanType):
            tx.num_bool_vars.append(c)
            continue
        # id rule is nunique == N in the reference; our distinct count is
        # approx (rsd=0.01) so allow a 2% margin on the non-null count
        if isinstance(dt, T.StringType):
            if p.n_distinct == 2:
                tx.string_bool_vars.append(c)  # :96-99
            # NLP BEFORE id (reference order: :122-125 precedes
            # :134-136): real free text is ~all-distinct, so an
            # id-first check would classify every text column id_vars
            # and text processing would silently lose it
            elif (p.max_len or 0) >= NLP_MIN_STRLEN and p.n_distinct >= 0.9 * nn:
                tx.nlp_vars.append(c)  # :122-125
            elif p.n_distinct >= 0.98 * nn and p.n > 100:
                tx.id_vars.append(c)  # :134-136 (nunique == N)
            elif (p.mean_len or 0) >= DISCRETE_MIN_MEAN_STRLEN or p.n_distinct > cat_limit:
                tx.discrete_string_vars.append(c)  # :126-133
            else:
                tx.cat_vars.append(c)  # :205-250
            continue
        if isinstance(dt, _INT):
            if p.n_distinct == 2:
                tx.num_bool_vars.append(c)  # :100-106
            elif p.n_distinct >= 0.98 * nn and p.n > 100:
                tx.id_vars.append(c)  # :165-175 (int id outside year range)
            elif p.n_distinct <= cat_limit:
                tx.cat_vars.append(c)  # int treated as categorical :151-192
            else:
                tx.int_vars.append(c)
            continue
        if isinstance(dt, _NUMERIC):
            if p.n_distinct == 2:
                tx.num_bool_vars.append(c)
            elif 3 <= p.n_distinct <= FLOAT_CAT_LIMIT:
                tx.cat_vars.append(c)  # float-as-cat :146-149 (float_limit)
            else:
                tx.continuous_vars.append(c)
            continue
        # arrays/maps/structs/binary: outside the reference's type system
        tx.cols_delete.append(c)
    return tx


def analyze_problem_type(df: DataFrame, target: str | list[str]) -> str:
    """Reference analyze_problem_type (featurewiz/ml_models.py:1750-1814):
    ≤2 uniques → Binary_Classification; int ≤30 / float ≤15 uniques →
    Multi_Classification; else Regression. A target LIST (multi-label,
    reference featurewiz.py:788-795) is typed by its FIRST column — the
    same convention the MultiOutput wrapper's first estimator imposes
    on importances (featurewiz.py:1408-1417)."""
    if not isinstance(target, str):
        target = target[0]
    dt = dict(df.dtypes)[target]
    n_unique = df.agg(F.countDistinct(target)).first()[0]
    if n_unique <= 2:
        return "Binary_Classification"
    if dt in ("tinyint", "smallint", "int", "bigint") and n_unique <= 30:
        return "Multi_Classification"
    if dt in ("float", "double") and n_unique <= 15:
        return "Multi_Classification"
    if dt == "string":
        return "Multi_Classification"
    return "Regression"
