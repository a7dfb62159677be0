from . import bm25, dense, fusion  # noqa: F401
