"""Dense (semantic) search leg: cosine top-k over an embedding column.

Parity target: the reference's dense KNN leg — cosine distance, filter +
score threshold pushed into the query, fetch 2*limit candidates
(client/src/search/flow.rs:59-77, flow_collect.rs:125-140; cosine metric
storage/collections/multi_tenant.rs:54).

Spark-first: brute-force cosine is a single narrow map + TakeOrdered — no
shuffle at all; it scales linearly with the scan and is embarrassingly
parallel across partitions. An IVF-pruned variant (operators/ann.py) swaps
in behind the same signature for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _query_vec_col(embeddings: DataFrame, query_vec, vec_col: str) -> tuple[DataFrame, Column]:
    """Accept either a Python list (→ literal array) or a 1-row DataFrame
    (→ broadcast cross join, keeps the whole plan lazy)."""
    if isinstance(query_vec, DataFrame):
        q = query_vec.select(F.col(vec_col).alias("__qvec"))
        return embeddings.crossJoin(F.broadcast(q)), F.col("__qvec")
    lit = F.array(*[F.lit(float(x)) for x in query_vec])
    return embeddings, lit


def dense_search(
    embeddings: DataFrame,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
    threshold: float = 0.0,
) -> DataFrame:
    """Top-k by cosine(query, embedding) with a score threshold applied at
    the leg level (NEVER post-fusion — options.rs:22-28).

    Returns (id_col, score) sorted by score desc, id asc.
    """
    df, qv = _query_vec_col(embeddings, query_vec, vec_col)
    return (
        df.select(F.col(id_col), cosine(F.col(vec_col), qv).alias("score"))
        .filter(F.col("score") >= F.lit(threshold))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
