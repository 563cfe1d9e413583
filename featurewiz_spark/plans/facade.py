"""FeatureWizSpark — the sklearn-style facade (reference FeatureWiz class,
featurewiz/featurewiz.py:2874-3541) as a fit/transform pipeline object.

fit_transform(df, target):
  classify columns (§1.2) → calendar-expand date vars (W1) → missing
  flags → groupby aggregates if 'groupby' in feature_engg (A1/A2) →
  categorical crosses if 'interactions' (§2.8) → label-encode remaining
  cats (E7) → median-clean NaNs (E9) → zero-variance drop (P5) → SULOV
  (F1) → recursive ranking (F2) → selected feature DataFrame.

transform(df) replays every fitted artifact (small tables / column
lists) on new data — the leakage boundary of reference EP2
(featurewiz.py:3253-3332): nothing is re-fit on test.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.functions.interactions import categorical_crosses
from featurewiz_spark.functions.transforms import drop_zero_variance
from featurewiz_spark.operators.encoders import (
    add_missing_flags,
    apply_frequency_encoding,
    apply_label_encoding,
    basen_encode,
    clean_nans,
    contrast_encode,
    frequency_encode,
    glmm_encode,
    hashing_encode,
    james_stein_groupby,
    label_encode,
    one_hot_encode,
    target_encode,
    woe_encode,
)
from featurewiz_spark.operators.groupby import (
    apply_fitted_aggregates,
    groupby_aggregate,
)
from featurewiz_spark.operators.timefeatures import add_calendar_features
from featurewiz_spark.profiling import analyze_problem_type, classify_columns
from featurewiz_spark.selection.ranker import recursive_feature_ranking
from featurewiz_spark.selection.sulov import sulov_select


@dataclass
class FeatureWizSpark:
    corr_limit: float = 0.90  # class-API default (featurewiz.py:2982)
    feature_engg: list[str] = field(default_factory=list)  # {'groupby','interactions','target'}
    # reference category_encoders param (databunch.py:252-327): names from
    # {'onehot','hashing','frequency','woe','helmert','sum',
    #  'backward_difference','polynomial','basen','james_stein','glmm'}
    category_encoders: list[str] = field(default_factory=list)
    skip_sulov: bool = False
    skip_ranking: bool = False
    sulov_mode: str = "pairwise"
    # reference correlation_types (sulov_method.py:107-136): a string or
    # a LIST of {'pearson','spearman','kendall'} — with a list, a pair
    # counts as correlated when ANY matrix crosses corr_limit
    correlation_types: str | list[str] = "pearson"
    # F2 ranking trains on a deterministic hash-ordered sample; the
    # reference caps its own training rows the same way. 10k mirrors the
    # reference default — raise it when selection quality at scale
    # matters more than fit time (selection is invariant to partitioning
    # either way; see tests/test_selection.py sample-size stability).
    ranking_sample_rows: int = 10000
    # 'sample' = reference-faithful driver sample; 'hist' = the
    # distributed histogram GBT (selection/dist_gbt.py) over every row —
    # the at-scale path when selection must see more than a sample.
    ranking_engine: str = "sample"
    # EP2 autoencoder extension point (reference featurewiz.py:3426-3501
    # optionally inserts a DAE/VAE between encoding and SULOV). The
    # models themselves are out of scope (SURVEY §2.12); this hook is
    # where one plugs in: a callable DataFrame → DataFrame applied after
    # engineering/encoding and BEFORE zero-variance/SULOV/ranking, on
    # both fit_transform and transform (it must be stateless or manage
    # its own fitted state, like a Spark ML Pipeline model's transform).
    feature_transformer: Any = None

    # fitted state
    features: list[str] = field(default_factory=list)
    problem_type: str | None = None
    _taxonomy: Any = None
    _date_vars: list[str] = field(default_factory=list)
    _cat_vars: list[str] = field(default_factory=list)
    _num_vars: list[str] = field(default_factory=list)
    _label_maps: dict = field(default_factory=dict)
    _cat_enc_state: dict = field(default_factory=dict)  # (encoder, col) → fitted table
    _fitted_aggs: dict = field(default_factory=dict)
    _nan_fills: dict = field(default_factory=dict)
    _dropped_zero_var: list[str] = field(default_factory=list)
    _target: str | None = None
    _targets: list[str] = field(default_factory=list)

    # ------------------------------------------------------------------
    def _engineer(self, df: DataFrame, fit: bool) -> DataFrame:
        # W1 calendar expansion of date vars
        for c in self._date_vars:
            df = add_calendar_features(df, c, prefix=c, crosses=False)
            df = df.drop(c)
        # missing flags + median fill on numerics
        if fit:
            df = add_missing_flags(df, self._num_vars)
            df, self._nan_fills = clean_nans(df, self._num_vars, flags=False)
        else:
            df = add_missing_flags(df, self._num_vars)
            df = df.withColumns(
                {
                    c: F.coalesce(F.col(c), F.lit(v))
                    for c, v in self._nan_fills.items()
                }
            )
        # groupby aggregate features
        if "groupby" in self.feature_engg and self._cat_vars and self._num_vars:
            if fit:
                df, self._fitted_aggs = groupby_aggregate(
                    df, self._cat_vars, self._num_vars, ["mean"]
                )
            else:
                df = apply_fitted_aggregates(df, self._fitted_aggs)
        # categorical crosses
        if "interactions" in self.feature_engg and len(self._cat_vars) >= 2:
            df = categorical_crosses(df, self._cat_vars)
            cross_cols = [
                f"{a}_cross_{b}"
                for i, a in enumerate(self._cat_vars)
                for b in self._cat_vars[i + 1 :]
            ]
        else:
            cross_cols = []
        # optional encoder suite (reference databunch.py:252-327): every
        # encoder fits a small mapping table on train; transform replays
        # it with a broadcast join (unseen → neutral default)
        df = self._apply_cat_encoders(df, fit)
        # label-encode categoricals (E7 sweep) — including the string
        # outputs of the W1 calendar expansion (month/day names,
        # typeofday), which the reference also label-encodes downstream
        cal_cats = [
            f"{c}_{s}"
            for c in self._date_vars
            for s in ("month_name", "dayofweek_name", "typeofday")
        ]
        for c in self._cat_vars + cross_cols + cal_cats:
            if fit:
                # max_categories=None: these columns were ALREADY
                # cardinality-bounded by classify_columns (cat_limit) /
                # cat×cat crosses / calendar names, so the encoder's
                # guard scan would only re-prove a known bound — N extra
                # full-table jobs per fit for nothing
                df, mapping = label_encode(df, c, max_categories=None)
                self._label_maps[c] = mapping
            else:
                df = apply_label_encoding(df, c, self._label_maps[c])
            df = df.drop(c)
        return df

    def _replay_mapping(self, df: DataFrame, col: str, tbl: DataFrame,
                        fill) -> DataFrame:
        from featurewiz_spark.operators.encoders import _join_fitted

        gen = [f.name for f in tbl.schema.fields if f.name != "value"]
        df = _join_fitted(df, col, tbl)
        if isinstance(fill, dict):  # per-generated-column fill values
            df = df.withColumns(
                {g: F.coalesce(F.col(g), F.lit(fill[g])) for g in gen if g in fill}
            )
        elif fill is not None:
            df = df.withColumns(
                {g: F.coalesce(F.col(g), F.lit(fill)) for g in gen}
            )
        return df

    def _apply_cat_encoders(self, df: DataFrame, fit: bool) -> DataFrame:
        for enc in self.category_encoders:
            for c in self._cat_vars:
                key = (enc, c)
                if enc == "hashing":  # stateless
                    df = hashing_encode(df, c)
                elif enc == "onehot":
                    if fit:
                        df, cats = one_hot_encode(df, c)
                        self._cat_enc_state[key] = cats
                    else:
                        df, _ = one_hot_encode(df, c, self._cat_enc_state[key])
                elif enc in ("helmert", "sum", "backward_difference", "polynomial"):
                    if fit:
                        df, cats = contrast_encode(df, c, kind=enc)
                        self._cat_enc_state[key] = cats
                    else:
                        df, _ = contrast_encode(df, c, kind=enc,
                                                categories=self._cat_enc_state[key])
                elif enc == "basen":
                    if fit:
                        df, cats = basen_encode(df, c)
                        self._cat_enc_state[key] = cats
                    else:
                        df, _ = basen_encode(df, c, categories=self._cat_enc_state[key])
                elif enc == "frequency":
                    if fit:
                        df, tbl = frequency_encode(df, c)
                        self._cat_enc_state[key] = tbl
                    else:
                        df = apply_frequency_encoding(df, c, self._cat_enc_state[key])
                elif enc == "woe":
                    if fit:
                        df, tbl = woe_encode(df, c, self._target)
                        self._cat_enc_state[key] = tbl
                    else:
                        df = self._replay_mapping(df, c, self._cat_enc_state[key], 0.0)
                elif enc == "target":
                    if fit:
                        df, tbl = target_encode(df, c, self._target)
                        # unseen-at-transform → the grand mean, matching
                        # fit-time's own coalesce (fill=None left NULLs
                        # the downstream model never saw at fit)
                        gm = float(df.agg(F.avg(self._target)).first()[0])
                        self._cat_enc_state[key] = (tbl, gm)
                    else:
                        tbl, gm = self._cat_enc_state[key]
                        df = self._replay_mapping(df, c, tbl, gm)
                elif enc == "james_stein":
                    if fit:
                        df, tbls = james_stein_groupby(df, [c], self._num_vars)
                        # unseen (n=0) shrinks fully to the global mean
                        # of each pseudo-target numeric — store per-col
                        gm_row = df.agg(
                            *[F.avg(n).alias(n) for n in self._num_vars]
                        ).first()
                        fills = {
                            f"GroupEncoded_{c}_{n}": float(gm_row[n])
                            for n in self._num_vars
                        }
                        self._cat_enc_state[key] = (tbls[c], fills)
                    else:
                        tbl, fills = self._cat_enc_state[key]
                        df = self._replay_mapping(df, c, tbl, fills)
                elif enc == "glmm":
                    if fit:
                        # reference: GLMMEncoder(binomial_target=True) for
                        # BINARY targets only — the one-step logit
                        # linearization assumes y ∈ {0,1}; a multiclass
                        # integer target would explode the working
                        # response, so Multi_Classification falls back to
                        # the gaussian family (documented deviation)
                        fam = (
                            "binomial"
                            if self.problem_type == "Binary_Classification"
                            else "gaussian"
                        )
                        df, tbl = glmm_encode(df, c, self._target, family=fam)
                        # unseen: random effect 0 on the logit scale /
                        # grand mean for gaussian (glmm_encode docstring)
                        gm = (
                            0.0
                            if fam == "binomial"
                            else float(df.agg(F.avg(self._target)).first()[0])
                        )
                        self._cat_enc_state[key] = (tbl, gm)
                    else:
                        tbl, gm = self._cat_enc_state[key]
                        df = self._replay_mapping(df, c, tbl, gm)
                else:
                    raise ValueError(f"unknown category encoder: {enc}")
        return df

    def fit_transform(self, df: DataFrame, target: str | list[str]) -> DataFrame:
        # multi-label targets (reference featurewiz.py:788-795): every
        # listed target is excluded from candidates; problem type and
        # target-aware encoders follow the FIRST target, mirroring the
        # reference's MultiOutput first-estimator convention (:1408-1417)
        targets = [target] if isinstance(target, str) else list(target)
        self._targets = targets
        self._target = targets[0]
        self.problem_type = analyze_problem_type(df, targets)
        # non-numeric targets: label-encode with an invertible map AFTER
        # problem typing (reference featurewiz.py:886-918 — typing runs
        # on the raw strings, then the ranking/encoder stages need a
        # numeric target; a raw string target crashed the GBT ranking
        # stage mid-pipeline). Deterministic sorted-value codes; NULL
        # targets stay NULL.
        from pyspark.sql import types as _T

        self._target_maps: dict = {}
        for t in targets:
            if isinstance(df.schema[t].dataType, _T.StringType):
                vals = sorted(
                    r[0]
                    for r in df.select(t).distinct().collect()
                    if r[0] is not None
                )
                self._target_maps[t] = {v: i for i, v in enumerate(vals)}
                mexpr = F.create_map(
                    *[
                        x
                        for v, i in self._target_maps[t].items()
                        for x in (F.lit(v), F.lit(i))
                    ]
                )
                df = df.withColumn(t, mexpr[F.col(t)].cast("int"))
        tx = classify_columns(df, target=targets)
        self._taxonomy = tx
        self._date_vars = tx.date_vars
        self._cat_vars = tx.cat_vars + tx.string_bool_vars
        self._num_vars = tx.continuous_vars + tx.int_vars + tx.num_bool_vars
        drop = tx.cols_delete + tx.id_vars + tx.nlp_vars + tx.discrete_string_vars
        df = df.drop(*drop)

        df = self._engineer(df, fit=True)
        if self.feature_transformer is not None:
            df = self.feature_transformer(df)
        candidates = [
            f.name
            for f in df.schema.fields
            if f.name not in targets
            and f.dataType.simpleString()
            in ("int", "bigint", "double", "float", "smallint", "tinyint")
        ]
        df, self._dropped_zero_var = drop_zero_variance(df, candidates)
        candidates = [c for c in candidates if c not in self._dropped_zero_var]

        selected = candidates
        if not self.skip_sulov and len(selected) > 1:
            selected = sulov_select(
                df, selected, targets[0], corr_limit=self.corr_limit,
                problem_type=self.problem_type, mode=self.sulov_mode,
                method=self.correlation_types,
            )
        if not self.skip_ranking and len(selected) > 1:
            selected = recursive_feature_ranking(
                df, selected, targets, self.problem_type,
                sample_rows=self.ranking_sample_rows,
                engine=self.ranking_engine,
            )
        self.features = selected
        return df.select(*selected, *targets)

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.features:
            raise RuntimeError("fit_transform must run first")
        # string targets were label-encoded during fit; a transform frame
        # carrying the target (e.g. a labeled validation split) must get
        # the SAME integer codes, or downstream train/test concatenation
        # sees int codes vs raw strings. Values unseen at fit → NULL
        # (there is no code for them — surfacing NULL beats inventing
        # one). Targets absent from df pass untouched. Only STRING
        # columns are remapped: a frame whose target is already numeric
        # (user pre-encoded it, or fit_transform output fed back in)
        # would probe int keys against a map<string,int> and silently
        # NULL every label.
        from pyspark.sql import types as _T

        for t, m in getattr(self, "_target_maps", {}).items():
            if t in df.columns and isinstance(
                df.schema[t].dataType, _T.StringType
            ):
                mexpr = F.create_map(
                    *[x for v, i in m.items() for x in (F.lit(v), F.lit(i))]
                )
                df = df.withColumn(t, mexpr[F.col(t)].cast("int"))
        drop = (
            self._taxonomy.cols_delete
            + self._taxonomy.id_vars
            + self._taxonomy.nlp_vars
            + self._taxonomy.discrete_string_vars
        )
        df = df.drop(*[c for c in drop if c in df.columns])
        df = self._engineer(df, fit=False)
        if self.feature_transformer is not None:
            df = self.feature_transformer(df)
        keep = [c for c in self.features if c in df.columns]
        extra = [c for c in self._targets if c in df.columns]
        return df.select(*keep, *extra)
