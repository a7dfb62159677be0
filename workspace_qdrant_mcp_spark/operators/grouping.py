"""A14 project-grouping strategies 2-5 (grouping/scheduler.rs:1-70).

The reference coordinates five strategies; strategy 1 (dependency-set
Jaccard) lives in keywords.grouping_jaccard. This module adds:

  - workspace membership     (grouping/workspace/)        — shared root key
  - git-org                  (grouping/git_org.rs)        — host/org of the
    normalized remote URL (normalize_git_url, project_id/calculator.rs:76-110)
  - embedding affinity       (grouping/affinity/computation.rs) — pairwise
    cosine over per-project mean embeddings ≥ 0.7, connected components
  - tag affinity             (grouping/affinity/tag_affinity.rs) — pairwise
    Jaccard over per-project distinct tag sets ≥ 0.25, connected components

Scale shapes: pair generation is always an equi-join (tag inverted index /
vector-position index), never a cross product over projects; the
connected-components closure is a fixed-sweep min-label propagation — the
same bounded-iteration shape as graph.connected_components, expressible as
an unrolled oracle CTE chain. Project counts are orders of magnitude below
document counts, so every aggregate here is map-side combinable and small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ckpt import checkpoint_with

TAG_AFFINITY_THRESHOLD = 0.25  # tag_affinity.rs:14
EMBEDDING_AFFINITY_THRESHOLD = 0.7  # affinity/config.rs:14
CC_SWEEPS = 8  # fixed sweeps; post-fixed-point sweeps are no-ops


# ---------------------------------------------------------------------------
# Connected components over affinity pairs (tag_affinity.rs:104-150)
# ---------------------------------------------------------------------------

def affinity_components(pairs: DataFrame, n_iters: int = CC_SWEEPS) -> DataFrame:
    """(tenant_id, group_key) — transitive closure of above-threshold
    pairs (A~B, B~C → one group); group_key = MIN member tenant id
    (deterministic, content-addressed). Tenants with no qualifying pair
    are not grouped (the reference builds groups from affinities only).
    Min-label propagation with a fixed sweep count."""
    und = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("u").alias("node"), F.col("u").alias("label"))
        .distinct()
        .localCheckpoint()
    )
    # r13 (the connected_components discipline): min over {own label} ∪
    # {neighbor labels} via union+groupBy — exactly least(own, min(nbrs))
    # without the per-round join-back. The own row rides a flag so the
    # convergence probe is a scan of the fresh checkpoint (new < old,
    # valid for any orderable label type incl. strings); labels only
    # ever decrease, so no change ⇒ fixed point ⇒ the remaining fixed
    # sweeps are identity and early exit preserves the exact n_iters
    # output.
    for _ in range(n_iters):
        msgs = und.join(labels, und.v == labels.node).select(
            F.col("u").alias("node"), "label", F.lit(False).alias("own")
        )
        # the convergence probe rides the checkpoint-materialization job
        # (r14, guide §2.4: one pass per sweep, not checkpoint + probe)
        new, changed = checkpoint_with(
            msgs.unionByName(
                labels.select("node", "label", F.lit(True).alias("own"))
            )
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("__old"),
            ),
            lambda d: d.filter(F.col("label") < F.col("__old")).count(),
        )
        labels = new.select("node", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("tenant_id"), F.col("label").alias("group_key")
    )


# ---------------------------------------------------------------------------
# Strategy: tag affinity (tag_affinity.rs:78-102)
# ---------------------------------------------------------------------------

def tag_affinity_pairs(
    tags: DataFrame, threshold: float = TAG_AFFINITY_THRESHOLD
) -> DataFrame:
    """(id_a, id_b, similarity) — pairwise Jaccard over per-tenant DISTINCT
    tag sets, pairs ≥ threshold. Inverted-index equi-join on tag (the
    scale-safe pair generator)."""
    tt = tags.select("tenant_id", "tag").distinct()
    sizes = tt.groupBy("tenant_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tt.alias("a")
        .join(tt.alias("b"), "tag")
        .filter(F.col("a.tenant_id") < F.col("b.tenant_id"))
        .groupBy(
            F.col("a.tenant_id").alias("id_a"), F.col("b.tenant_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("tenant_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("tenant_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .withColumn(
            "similarity",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", F.round("similarity", 6).alias("similarity"))
    )


def tag_affinity_groups(
    tags: DataFrame, threshold: float = TAG_AFFINITY_THRESHOLD
) -> DataFrame:
    return affinity_components(tag_affinity_pairs(tags, threshold))


# ---------------------------------------------------------------------------
# Strategy: embedding affinity (affinity/computation.rs:17-43)
# ---------------------------------------------------------------------------

def project_mean_embeddings(vecs: DataFrame) -> DataFrame:
    """(tenant_id, pos, val) — per-project uniform-mean embedding
    (aggregate_document_embedding, tagging/aggregation.rs:12-21), kept in
    exploded (pos, val) form so downstream cosine is an equi-join on pos,
    not an array cross product."""
    return (
        vecs.select("tenant_id", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("tenant_id", "pos")
        .agg(F.avg("x").alias("val"))
    )


def embedding_affinity_pairs(
    vecs: DataFrame, threshold: float = EMBEDDING_AFFINITY_THRESHOLD
) -> DataFrame:
    """(id_a, id_b, similarity) — pairwise cosine over per-project mean
    embeddings, ≥ threshold. Join on vector position: partial dot products
    are map-side combinable."""
    mean = project_mean_embeddings(vecs).localCheckpoint()
    norms = mean.groupBy("tenant_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    dots = (
        mean.alias("a")
        .join(mean.alias("b"), "pos")
        .filter(F.col("a.tenant_id") < F.col("b.tenant_id"))
        .groupBy(
            F.col("a.tenant_id").alias("id_a"), F.col("b.tenant_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.val") * F.col("b.val")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("tenant_id").alias("id_a"), F.col("norm").alias("norm_a")), "id_a")
        .join(norms.select(F.col("tenant_id").alias("id_b"), F.col("norm").alias("norm_b")), "id_b")
        # round BEFORE thresholding so the boundary compare is identical
        # across engines (double summation order differs in the low bits)
        .withColumn(
            "similarity", F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6)
        )
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
    )


def embedding_affinity_groups(
    vecs: DataFrame, threshold: float = EMBEDDING_AFFINITY_THRESHOLD
) -> DataFrame:
    return affinity_components(embedding_affinity_pairs(vecs, threshold))


# ---------------------------------------------------------------------------
# Strategy: git-org (git_org.rs:27-58 + normalize_git_url)
# ---------------------------------------------------------------------------

def extract_git_org(url: Column) -> Column:
    """host/org of a normalized git remote URL, NULL when no org component
    (git_org.rs:27-52). Normalization (calculator.rs:76-110): lowercase,
    strip scheme, strip userinfo (last '@' before first '/'), scp-style
    colon→slash only when schemeless, strip .git and trailing slashes."""
    lowered = F.lower(url)
    has_scheme = lowered.rlike("^(https://|http://|ssh://|git://)")
    stripped = F.regexp_replace(lowered, "^(https://|http://|ssh://|git://)", "")
    # userinfo: greedy [^/]* reaches the LAST '@' before the first '/'
    host_part = F.regexp_extract(stripped, "^([^/]*)", 1)
    had_userinfo = host_part.contains("@")
    no_user = F.regexp_replace(stripped, "^[^/]*@", "")
    # scp-like syntax replaces only the FIRST ':' (calculator.rs:96-100);
    # Spark regexp_replace is replace-all, so anchor on the pre-colon head.
    scp_fixed = F.when(
        has_scheme | ~had_userinfo, no_user
    ).otherwise(F.regexp_replace(no_user, "^([^:/]*):", "$1/"))
    no_git = F.regexp_replace(scp_fixed, "\\.git$", "")
    norm = F.regexp_replace(no_git, "/+$", "")
    parts = F.split(norm, "/")
    return F.when(
        (F.size(parts) >= 3)
        & (F.length(parts[0]) > 0)
        & (F.length(parts[1]) > 0),
        F.concat(parts[0], F.lit("/"), parts[1]),
    )


def git_org_groups(projects: DataFrame) -> DataFrame:
    """(tenant_id, group_key) over (tenant_id, remote_url) rows —
    group_key = 'git_org:' || host/org (org_to_group_id, git_org.rs:57);
    projects with no org component are ungrouped (dropped)."""
    return (
        projects.select(
            "tenant_id", extract_git_org(F.col("remote_url")).alias("org")
        )
        .filter(F.col("org").isNotNull())
        .select(
            "tenant_id", F.concat(F.lit("git_org:"), F.col("org")).alias("group_key")
        )
    )


# ---------------------------------------------------------------------------
# Strategy: workspace membership (grouping/workspace/)
# ---------------------------------------------------------------------------

def workspace_groups(projects: DataFrame) -> DataFrame:
    """(tenant_id, group_key) over (tenant_id, workspace_root) rows —
    projects sharing a workspace manifest root form one group
    (group_type 'workspace'); NULL root = standalone project, ungrouped."""
    return (
        projects.filter(F.col("workspace_root").isNotNull())
        .select(
            "tenant_id",
            F.concat(F.lit("workspace:"), F.col("workspace_root")).alias("group_key"),
        )
    )
