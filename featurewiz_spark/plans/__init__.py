from featurewiz_spark.plans.pipeline import events_feature_pipeline, pages_feature_pipeline

__all__ = ["pages_feature_pipeline", "events_feature_pipeline"]
