"""workspace_qdrant_mcp_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ChrisGVE/workspace-qdrant-mcp.

The reference is a project-scoped hybrid (dense + sparse BM25) search engine
with RRF fusion, source-diversity re-ranking, a code-relationship graph with
analytics, an exact/regex grep engine, and a keyword/tag extraction pipeline.
This package re-expresses every one of those operators Spark-first:
DataFrame/SQL plans that Catalyst can optimize, with Pandas UDFs only where
built-in operators genuinely cannot express the semantics.

Layout:
  functions/   tokenization, vector math, hashing primitives (pure column expr)
  operators/   search/ranking/graph/dedup/keyword operators (DataFrame → DataFrame)
  sources/     chunking + code_lines derivation, multimodal plumbing
  plans/       composed end-to-end query pipelines (the reference's MCP tools)
  streaming/   Structured Streaming ingestion (watcher-queue parity)
"""

__version__ = "0.1.0"
