from featurewiz_spark.operators.asof import (
    asof_join,
    lag_join,
    latest_per_entity,
)
from featurewiz_spark.operators.windows import (
    backfill,
    duration_between_rows,
    forward_fill,
    lag_lead,
    rolling_agg,
    sessionize,
)
from featurewiz_spark.operators.timefeatures import (
    add_age_features,
    add_calendar_features,
    add_elapsed_features,
    add_fourier_features,
)

__all__ = [
    "asof_join",
    "lag_join",
    "latest_per_entity",
    "backfill",
    "forward_fill",
    "lag_lead",
    "rolling_agg",
    "sessionize",
    "duration_between_rows",
    "add_calendar_features",
    "add_fourier_features",
    "add_elapsed_features",
    "add_age_features",
]
