"""Keyword-extraction / enrichment analytics (SURVEY §2.5 A5-A14).

  A5/A8 tfidf_keywords   : per-doc top terms by tf·idf with the BM25 idf
                           (keyword_extraction/lexical_candidates.rs +
                            keyword_selector.rs:52-69 idf penalty)
  A6 label_centroids     : mean vector per group — the quasi-summary vector
                           (semantic_rerank.rs:78 weighted_mean_vector)
  A7 centroid_rerank     : cosine(member, group centroid) top-k
                           (semantic_rerank.rs:50)
  A9 mmr_select          : greedy MMR λ·rel − (1−λ)·max_sim with the
                           inter-tag similarity cutoff
                           (tag_selector.rs:98-133; defaults :60-66 —
                            λ=0.7, max_inter_sim=0.8, max 8)
  A10 taxonomy_tags      : zero-shot tagging vs a taxonomy: threshold 0.35,
                           per-category dedup where a SECOND term from a
                           category survives only when best−score >
                           3·min_score_gap (=0.06), then max 10 tags
                           (tagging/tier2.rs:28-46, :180-209)
  A12 keyword_baskets    : tag → sorted keyword list
                           (basket_assignment.rs)
  A14 grouping_jaccard   : pairwise dependency-set Jaccard |A∩B|/|A∪B|
                           (grouping/dependency.rs:263-270) — here supplier
                           part-sets play the role of project dependency
                           sets

Everything except MMR is pure column/window expressions. MMR is inherently
greedy-sequential → a pure-python function applied per small candidate
group (the reference runs it on <=dozens of candidates per document)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .bm25 import doc_freq, doc_terms, idf_expr

TIER2_THRESHOLD = 0.35
TIER2_MAX_TAGS = 10
TIER2_SCORE_GAP = 0.02
MMR_LAMBDA = 0.7
MMR_MAX_INTER_SIM = 0.80
MMR_MAX_TAGS = 8


def tfidf_keywords(docs: DataFrame, top_n: int = 5) -> DataFrame:
    """(doc_id, term, tfidf, rnk) — top_n terms per doc by tf·idf, idf from
    the BM25 formula (so hapax-heavy terms rank high), deterministic
    (score desc, term asc) cut."""
    terms = doc_terms(docs)
    dfreq = doc_freq(terms)
    n = docs.count()
    scored = (
        terms.join(F.broadcast(dfreq), "term")
        .withColumn(
            "tfidf", F.col("tf").cast("double") * idf_expr(F.lit(float(n)))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .filter(F.col("tfidf") > 0)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rnk")
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, dim, value) — mean embedding per label, long format (the
    quasi-summary vector). posexplode + avg groupBy: map-side combinable."""
    return (
        emb.select("label", F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("value"))
    )


def _centroid_wide(emb: DataFrame) -> DataFrame:
    """(label, centroid ARRAY<DOUBLE>) — assembled from the long form with
    an order-pinned collect (sort by dim before array_agg)."""
    longf = (
        emb.select("label", F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("value"))
    )
    return (
        longf.groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("dim", "value"))).alias("dv"))
        .select(
            "label",
            F.transform(F.col("dv"), lambda x: x["value"]).alias("centroid"),
        )
    )


def centroid_rerank(emb: DataFrame, top_k: int = 3) -> DataFrame:
    """(label, vec_id, score, rnk) — members closest to their group
    centroid (semantic re-rank against the quasi-summary vector)."""
    cents = _centroid_wide(emb)
    scored = emb.join(F.broadcast(cents), "label").select(
        "label",
        "vec_id",
        cosine(F.col("embedding"), F.col("centroid")).alias("score"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("label", "vec_id", F.round("score", 6).alias("score"), "rnk")
    )


def taxonomy_tags(
    emb: DataFrame,
    taxonomy: DataFrame,
    threshold: float = TIER2_THRESHOLD,
    max_tags: int = TIER2_MAX_TAGS,
    score_gap: float = TIER2_SCORE_GAP,
) -> DataFrame:
    """(vec_id, term, score, category) — zero-shot tags. taxonomy: (term,
    category, embedding). Semantics replicated from tier2.rs:180-209:
    threshold filter → per-category: best term always kept, later terms
    only when best − score > 3·gap → global max_tags cut (score desc,
    term asc). Category is threaded through from the taxonomy row that
    produced the match (not re-joined on term afterwards), so a term
    appearing under multiple categories keeps exactly its matched
    category and cannot fan out."""
    matches = (
        emb.crossJoin(F.broadcast(taxonomy.select(
            "term", "category", F.col("embedding").alias("tax_emb")
        )))
        .select(
            "vec_id", "term", "category",
            cosine(F.col("embedding"), F.col("tax_emb")).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    wc = Window.partitionBy("vec_id", "category").orderBy(
        F.desc("score"), F.asc("term")
    )
    cat_best = Window.partitionBy("vec_id", "category")
    kept = (
        matches.withColumn("cat_rn", F.row_number().over(wc))
        .withColumn("cat_best", F.max("score").over(cat_best))
        .filter(
            (F.col("cat_rn") == 1)
            | (F.col("cat_best") - F.col("score") > 3 * score_gap)
        )
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        kept.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= max_tags)
        .select(
            "vec_id", "term", F.round("score", 6).alias("score"), "category"
        )
    )


# G13 concept layer: cosine-confidence depth bands mapped onto the
# reference's DepthLevel enum (graph/mod.rs:305-371 ordinals 0-4).
DEPTH_BANDS = (
    (0.80, "reference", 4),
    (0.65, "rigorous", 3),
    (0.50, "intermediate", 2),
    (0.40, "introductory", 1),
)
DEPTH_FLOOR = ("qualitative", 0)


def concept_layer(
    emb: DataFrame,
    taxonomy: DataFrame,
    threshold: float = TIER2_THRESHOLD,
    max_tags: int = TIER2_MAX_TAGS,
    score_gap: float = TIER2_SCORE_GAP,
) -> DataFrame:
    """(vec_id, concept_id, term, category, edge_type, confidence, depth,
    depth_ordinal) — the G13 concept layer as an edge table: each
    taxonomy tag that survives the tier-2 gates becomes a COVERS_TOPIC
    edge from the embedding's owner to a global-tenant concept node
    (concept_node + COVERS_TOPIC, graph/mod.rs:68-75,160-165), with the
    cosine as edge confidence and a deterministic DepthLevel band
    (mod.rs:305-371). Concept node ids follow the extractor's scheme:
    sha256('__global__|taxonomy|term|concept') prefix-16."""
    tags = taxonomy_tags(emb, taxonomy, threshold, max_tags, score_gap)
    depth = F.lit(DEPTH_FLOOR[0])
    ordinal = F.lit(DEPTH_FLOOR[1])
    for cut, name, ordv in reversed(DEPTH_BANDS):
        depth = F.when(F.col("score") >= cut, name).otherwise(depth)
        ordinal = F.when(F.col("score") >= cut, ordv).otherwise(ordinal)
    return tags.select(
        "vec_id",
        F.substring(
            F.sha2(
                F.concat(
                    F.lit("__global__|taxonomy|"), F.col("term"), F.lit("|concept")
                ),
                256,
            ),
            1,
            16,
        ).alias("concept_id"),
        "term",
        "category",
        F.lit("COVERS_TOPIC").alias("edge_type"),
        F.col("score").alias("confidence"),
        depth.alias("depth"),
        ordinal.cast("int").alias("depth_ordinal"),
    )


def keyword_baskets(docs: DataFrame, top_n: int = 5) -> DataFrame:
    """(source, n_keywords, keywords) — per-source basket of distinct
    top-tfidf keywords, sorted and pipe-joined (stable scalar for hashing)."""
    kws = tfidf_keywords(docs, top_n)
    src = docs.select("doc_id", "source")
    return (
        kws.join(src, "doc_id")
        .groupBy("source")
        .agg(F.sort_array(F.collect_set("term")).alias("ks"))
        .select(
            "source",
            F.size("ks").alias("n_keywords"),
            F.array_join("ks", "|").alias("keywords"),
        )
    )


def grouping_jaccard(lineitem: DataFrame, threshold: float = 0.0) -> DataFrame:
    """(id_a, id_b, jaccard) — supplier-pair Jaccard over distinct
    part sets (the dependency-set grouping strategy, A14)."""
    sp = lineitem.select(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk")
    ).distinct()
    sizes = sp.groupBy("sk").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sp.alias("a")
        .join(sp.alias("b"), "pk")
        .filter(F.col("a.sk") < F.col("b.sk"))
        .groupBy(F.col("a.sk").alias("id_a"), F.col("b.sk").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("sk").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("sk").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# A9 — MMR tag selection (greedy, sequential by nature)
# ---------------------------------------------------------------------------

def mmr_select(
    candidates: list[tuple[str, float, list[float]]],
    lam: float = MMR_LAMBDA,
    max_inter_sim: float = MMR_MAX_INTER_SIM,
    max_tags: int = MMR_MAX_TAGS,
) -> list[tuple[str, float]]:
    """Greedy MMR over (tag, relevance, vector) candidates — the exact
    reference loop (tag_selector.rs:98-133): each round picks argmax of
    λ·rel − (1−λ)·max_sim_to_selected, skipping candidates whose max_sim
    exceeds the cutoff; stops when none qualify or max_tags reached.
    Returns [(tag, mmr_score)] in selection order."""

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    selected: list[tuple[int, float]] = []
    remaining = list(range(len(candidates)))
    while len(selected) < max_tags and remaining:
        best_idx, best_mmr = None, float("-inf")
        for r in remaining:
            rel = candidates[r][1]
            max_sim = (
                max(cos(candidates[r][2], candidates[s][2]) for s, _ in selected)
                if selected
                else 0.0
            )
            if max_sim > max_inter_sim and selected:
                continue
            mmr = lam * rel - (1.0 - lam) * max_sim
            if mmr > best_mmr:
                best_mmr = mmr
                best_idx = r
        if best_idx is None:
            break
        selected.append((best_idx, best_mmr))
        remaining = [r for r in remaining if r != best_idx]
    return [(candidates[i][0], s) for i, s in selected]
