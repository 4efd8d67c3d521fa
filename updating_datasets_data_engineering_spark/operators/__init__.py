from . import analytics, dedup, ingest, merge, multimodal, similarity  # noqa: F401
