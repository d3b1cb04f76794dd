from redmap_spark.multimodal.columns import (
    attach_payload,
    extract_features,
    FEATURE_SCHEMA,
)

__all__ = ["attach_payload", "extract_features", "FEATURE_SCHEMA"]
