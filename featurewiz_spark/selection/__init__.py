from featurewiz_spark.selection.sulov import (
    correlation_matrix,
    mutual_info,
    sulov_select,
)
from featurewiz_spark.selection.ranker import recursive_feature_ranking

__all__ = [
    "correlation_matrix",
    "mutual_info",
    "sulov_select",
    "recursive_feature_ranking",
]
