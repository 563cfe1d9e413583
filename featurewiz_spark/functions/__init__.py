from featurewiz_spark.functions.interactions import (
    categorical_crosses,
    numeric_interactions,
    polynomial_features,
)
from featurewiz_spark.functions.strings import (
    concat_columns,
    sanitize_column_names,
    split_field,
    strip_commas_numeric,
)
from featurewiz_spark.functions.transforms import numeric_transforms

__all__ = [
    "numeric_interactions",
    "categorical_crosses",
    "polynomial_features",
    "split_field",
    "concat_columns",
    "strip_commas_numeric",
    "sanitize_column_names",
    "numeric_transforms",
]
