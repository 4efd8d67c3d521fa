from . import (  # noqa: F401
    analytics,
    bucketing,
    dedup,
    incremental,
    ingest,
    maintenance,
    merge,
    ml_lsh,
    multimodal,
    similarity,
    skew,
)
