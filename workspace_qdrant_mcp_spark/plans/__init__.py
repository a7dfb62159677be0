from . import search_pipeline  # noqa: F401
