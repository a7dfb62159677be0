from . import fairness, ingest  # noqa: F401
