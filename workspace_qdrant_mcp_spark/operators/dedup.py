"""Deduplication operators for large-scale training-data pipelines.

Seven strategies, each with the plan shape that survives a 100 TB corpus:
  - exact        : hash-groupBy on a content digest (one shuffle on a
                   16-byte key; see __spark_entry__ dedup_exact)
  - ngram Jaccard: word n-gram posting join → pair-count → Jaccard — the
                   classic inverted-index candidate generation; the gram
                   join replaces the O(N²) cross product
  - MinHash+LSH  : char-shingle minhash signatures → banded bucket join →
                   exact-Jaccard verify. The band join is the ONLY pair
                   generator — candidates scale with collisions, not N²
  - SimHash      : tf-weighted 32-bit fingerprint; near-dup pairs via the
                   4-band pigeonhole trick (hamming <= 3 → at least one of
                   four 8-bit bands equal), then exact hamming verify
  - embedding    : cosine >= threshold within a blocking key (label here;
                   LSH/IVF buckets at scale), pairs only inside blocks
  - SemDeDup     : nearest-centroid clusters as the blocking key, min-id
                   exemplar keeps per within-cluster near-set
                   (arXiv:2303.09540)
  - repeated span: stride-windowed exact substring counts, per-doc
                   duplicated-span fraction (arXiv:2107.06499 — the
                   suffix array as a shuffle-friendly span aggregate)

The reference's dedup is ingest-time content-hash skip (W5,
strategies/processing/file/dedup.rs via ingest.rs:86-106); everything
beyond exact-hash is the training-data extension this engine adds.

All hashes are md5-based (functions/hashing.py) so the DuckDB oracle
reproduces them bit-for-bit. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from ..functions.text import char_shingles, tokenize_bm25
from ..io import fan_out

N_MINHASHES = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
JACCARD_THRESHOLD = 0.5
# Stop-gram frequency cap for the n-gram inverted-index join: grams in
# more than this fraction of documents are dropped before the self-join
# (f docs sharing a gram → f² join rows; a too-common gram carries no
# dedup signal anyway — the n-gram analog of a stopword).
MAX_GRAM_DF_FRAC = 0.5
COSINE_DUP_THRESHOLD = 0.9
HAMMING_THRESHOLD = 3
NEAR_COPY_OFFSET = 2000000  # synthetic near-copy id offset (both corpora)


# ---------------------------------------------------------------------------
# Synthetic near-copy corpora (deterministic, reproduced by the oracle SQL)
# ---------------------------------------------------------------------------

def with_near_copies(docs: DataFrame, modulo: int = 7, cut: int = 25) -> DataFrame:
    """documents ∪ truncated copies: doc_id%modulo==0 re-inserted with
    id+2000000 and the last `cut` chars dropped — true near-duplicates."""
    orig = docs.select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % modulo == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr(f"substring(text, 1, length(text) - {cut})").alias("text"),
    )
    return orig.unionByName(copies)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined). Empty array when < n words."""
    w = F.filter(F.split(text, "\\s+"), lambda t: F.length(t) > 0)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    corpus: DataFrame,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_df_frac: float | None = MAX_GRAM_DF_FRAC,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with word-n-gram Jaccard >= threshold.

    Plan: explode distinct grams → stop-gram cap → gram self-join (the
    inverted index) → per-pair intersection count → join sizes → Jaccard
    filter. The gram join shuffles on the gram — skew on stop-grams is
    THE scale risk: one gram shared by f docs contributes f² join rows,
    so a boilerplate gram in 1% of a 10B-doc corpus alone is 10^16 pairs.
    The cap drops grams whose doc frequency exceeds max_df_frac of the
    corpus BEFORE the self-join (the stop set is tiny by construction —
    broadcast anti-join), bounding any gram's contribution; Jaccard is
    then computed over each document's KEPT gram set (sizes recomputed
    after the cap, mirrored in the oracle). A gram that common carries no
    dedup signal — it's the n-gram analog of a stopword. AQE skew-join
    handles the sub-cap residue. max_df_frac=None disables the cap.
    """
    # join on the gram's int64 hash, not the ~3-word string — smaller
    # shuffle keys and cheaper hash-join probes (collisions ~1e-10/pair,
    # mirrored in the oracle)
    # materialize the gram table once (r13, guide §5: cache what is
    # reused): it feeds FOUR consumers — the stop-gram df count, both
    # sides of the inverted-index self-join, and the kept-size
    # aggregate — and scan subtrees are not covered by AQE exchange
    # reuse, so the lazy shape re-ran the explode+md5 per consumer.
    # eager=False: plan assembly stays job-free (locked by
    # test_cap_is_plan_side_not_driver); the first action materializes.
    grams = (
        fan_out(corpus)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    word_ngrams(F.col("text"), n), lambda g: md5_hash64(g)
                )
            ).alias("gram"),
        )
        .localCheckpoint(eager=False)
    )
    if max_df_frac is not None:
        # n_docs as a lazy 1-row broadcast aggregate (no driver action);
        # word_ngrams is per-doc distinct, so count(*) per gram == df
        nn = corpus.agg(
            F.count(F.lit(1)).cast("double").alias("__n_docs")
        )
        stop = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .crossJoin(F.broadcast(nn))
            .filter(F.col("__df") > F.col("__n_docs") * F.lit(max_df_frac))
            .select("gram")
        )
        grams = grams.join(F.broadcast(stop), "gram", "left_anti")
        sizes = grams.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_grams")
        )
    else:
        sizes = fan_out(corpus).select(
            "doc_id", F.size(word_ngrams(F.col("text"), n)).alias("n_grams")
        )
    pairs = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_grams", "na")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_grams", "nb"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Affine universal-hash constants for the minhash family:
#   h_j(s) = (A_j * h32(s) + B_j) mod 2^32,  h32 = md5_hash64(s) & 0xFFFFFFFF
# A_j odd and < 2^20 keeps A_j * h32 < 2^52 — safe under ANSI int64
# (no overflow error), and bit-reproducible in the DuckDB oracle.
MINHASH_MOD = 1 << 32


def minhash_a(j: int) -> int:
    return 97 + 12 * j


def minhash_b(j: int) -> int:
    return 7 + 31 * j


def minhash_signatures(
    corpus: DataFrame, n_hashes: int = N_MINHASHES, shingle_k: int = 5
) -> DataFrame:
    """(doc_id, v0..v{n-1}) — wide minhash signature over distinct char-k
    shingles.

    Plan: ONE md5 per (doc, shingle) row reduced to 32 bits, then the
    n_hashes family as affine integer hashes computed INSIDE the min
    aggregates — no per-j explode, no hash-table join, and the signature
    groupBy is map-side combinable. (First version hashed a distinct-shingle
    table with 16 md5s and joined back — the integer family is ~2x faster
    at equal quality and keeps the oracle exact.)"""
    # NOTE: no array_distinct before the explode — measured 11s -> 13-14s
    # at sf0.1: 5-char shingles over natural text are mostly unique, so
    # per-row string set-building costs more than the duplicate rows it
    # removes from the min aggregates.
    sh = fan_out(corpus).select(
        "doc_id", F.explode(char_shingles(F.col("text"), shingle_k)).alias("s")
    )
    h32 = (md5_hash64(F.col("s")) % F.lit(MINHASH_MOD)).alias("h32")
    hashed = sh.select("doc_id", h32)
    aggs = [
        F.min(
            (F.lit(minhash_a(j)) * F.col("h32") + F.lit(minhash_b(j)))
            % F.lit(MINHASH_MOD)
        ).alias(f"v{j}")
        for j in range(n_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_band_buckets(
    signatures: DataFrame,
    bands: int = MINHASH_BANDS,
    n_hashes: int = N_MINHASHES,
) -> DataFrame:
    """(doc_id, band, bucket) — bucket = md5 of the band's ordered minhash
    values. String bucket keys keep the join key scalar (identical semantics
    in the oracle). Bands come from the wide signature by column slicing —
    no shuffle at all; the per-band rows are generated by ONE inline
    explode instead of a bands-way union of scans (r13, guide §2.3 —
    identical rows, 1/bands the scan work and plan size, which doubles up
    because both sides of the downstream band self-join carry this
    subtree)."""
    rows = n_hashes // bands
    per_band = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"v{band * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    ).cast("binary")
                ).alias("bucket"),
            )
            for band in range(bands)
        ]
    )
    return signatures.select(
        "doc_id", F.explode(per_band).alias("__bb")
    ).select(
        "doc_id",
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )


def minhash_lsh_neardup(
    corpus: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    shingle_k: int = 5,
    n_hashes: int = N_MINHASHES,
) -> DataFrame:
    """(id_a, id_b, jaccard) — LSH candidate pairs verified by exact
    char-shingle Jaccard: band-bucket join generates candidates (complete
    for J >= ~0.5 by the LSH guarantee), exact verify keeps only true
    pairs. (A signature-agreement estimate prefilter was tried between the
    stages and REMOVED: on a low-entropy corpus it filtered nothing while
    costing ~1% recall on borderline J≈0.5 pairs — the verified funnel is
    candidates → exact only.)"""
    # The signature table is tiny (one row per doc) but expensive to derive
    # (one md5 per distinct shingle); every downstream stage — both sides of
    # the band self-join and the candidate generator — re-reads it, so
    # materialize it once. Same for the verify shingle-set table below.
    sigs = minhash_signatures(
        corpus, n_hashes=n_hashes, shingle_k=shingle_k
    ).localCheckpoint()
    buckets = lsh_band_buckets(sigs, n_hashes=n_hashes)
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    cand = cand.localCheckpoint()
    return exact_verify_pairs(corpus, cand, threshold, shingle_k)


def exact_verify_pairs(
    corpus: DataFrame,
    cand: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact char-shingle Jaccard over a bounded candidate-pair table —
    the shared verify stage of the batch and incremental minhash paths.

    Verify sets as int32 shingle hashes: 4-byte elements instead of
    k-char strings — smaller candidate-join shuffle, cheaper intersects;
    hash collisions (~1e-5/doc) are identical in the oracle. Sets are
    built only for docs that survived candidate generation — LSH
    candidates are a vanishing fraction of the corpus at scale, so the
    semi-join prune keeps the broadcast side bounded by |candidates|,
    not |corpus|."""
    return _verify_against_corpus(
        corpus,
        cand,
        F.array_distinct(
            F.transform(
                char_shingles(F.col("text"), shingle_k),
                lambda s: md5_hash64(s) % F.lit(MINHASH_MOD),
            )
        ),
        threshold,
    )


def _verify_against_corpus(
    corpus: DataFrame,
    cand: DataFrame,
    set_expr: Column,
    threshold: float,
) -> DataFrame:
    """The shared verify-tail SCAFFOLDING of the minhash and
    prefix-filter paths: candidate-id union → broadcast left_semi prune
    of the corpus → element-set build (set_expr over `text`) →
    localCheckpoint (the set table is re-read twice by the pair join) →
    _jaccard_from_sets. Callers differ only in set_expr (int32 char
    shingles vs word-gram hashes); the prune/checkpoint discipline
    lives here once."""
    cand_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        fan_out(corpus)
        .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", set_expr.alias("ss"))
        .localCheckpoint()
    )
    return _jaccard_from_sets(cand, sets, threshold)


def _intersect_batches(it):
    """mapInArrow kernel of the exact-verify tail (r14, guide §4.2 "hand
    whole batches to vectorized native libraries"): per (pair, sa, sb)
    row, |sa ∩ sb| — computed for the WHOLE batch with numpy instead of
    one JVM hash-set build per pair (array_intersect re-hashed each
    doc's set once per pair it appears in; this was the single biggest
    exec-bound cell of the bench). Exact integer output: element values
    are remapped to compact ids with np.unique, keyed by row, and a key
    seen twice is common to both sides (within one side keys are unique
    because the set arrays are array_distinct). Constructed once per
    task, vectorized over every batch (guide §4.5)."""
    import numpy as np
    import pyarrow as pa

    for b in it:
        n = b.num_rows
        sa, sb = b.column(2), b.column(3)
        if sa.null_count or sb.null_count:  # inner joins feed this
            raise ValueError("_intersect_batches: null set array")
        la = sa.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        lb = sb.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        va = sa.flatten().to_numpy(zero_copy_only=False)
        vb = sb.flatten().to_numpy(zero_copy_only=False)
        ra = np.repeat(np.arange(n, dtype=np.int64), la)
        rb = np.repeat(np.arange(n, dtype=np.int64), lb)
        # compact value ids (bounded by total elements < 2^32 per batch)
        _, inv = np.unique(np.concatenate([va, vb]), return_inverse=True)
        ka = (ra << np.int64(32)) | inv[: len(va)]
        kb = (rb << np.int64(32)) | inv[len(va):]
        uk, counts = np.unique(np.concatenate([ka, kb]), return_counts=True)
        inter = np.bincount(
            (uk[counts == 2] >> np.int64(32)), minlength=n
        ).astype(np.int32)
        yield pa.record_batch(
            [
                b.column(0),
                b.column(1),
                pa.array(inter),
                pa.array(la.astype(np.int32)),
                pa.array(lb.astype(np.int32)),
            ],
            names=["id_a", "id_b", "inter", "na", "nb"],
        )


def _jaccard_from_sets(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """(id_a, id_b, jaccard >= threshold) from a candidate-pair table and
    a (doc_id, ss: array<long>) element-set table bounded by the
    candidates — the shared exact-verify tail of the minhash (char
    shingles) and prefix-filter (word grams) paths. Both set tables are
    broadcast: candidates are a vanishing fraction of the corpus at
    scale, so the broadcast side is bounded by |candidates|.

    The per-pair intersection count runs as a vectorized Arrow batch
    kernel (_intersect_batches; r14 A/B vs F.size(array_intersect) in
    OPTIMIZATION_r14.md) — only the four needed columns cross the
    boundary, and the jaccard division + threshold filter stay in the
    JVM on the exact integer (inter, na, nb) emission, so the output is
    bit-identical to the former expression."""
    id_t = dict(cand.dtypes)
    paired = cand.join(
        F.broadcast(
            sets.select(F.col("doc_id").alias("id_a"), F.col("ss").alias("sa"))
        ),
        "id_a",
    ).join(
        F.broadcast(
            sets.select(F.col("doc_id").alias("id_b"), F.col("ss").alias("sb"))
        ),
        "id_b",
    )
    counted = paired.select("id_a", "id_b", "sa", "sb").mapInArrow(
        _intersect_batches,
        f"id_a {id_t['id_a']}, id_b {id_t['id_b']}, "
        "inter int, na int, nb int",
    )
    return (
        counted.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def prefix_jaccard_pairs(
    corpus: DataFrame,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(id_a, id_b, jaccard >= threshold) by PREFIX-FILTERED set-
    similarity join (Chaudhuri et al. 2006 prefix filtering; Bayardo et
    al. 2007 All-Pairs; Xiao et al. 2008 PPJoin) — the lossless upgrade
    of ngram_jaccard_pairs' full inverted index.

    Order every document's gram set by GLOBAL rarity (df asc, gram asc)
    and index only its PREFIX of length |s| - ceil(t*|s|) + 1: two sets
    with Jaccard >= t must overlap in >= ceil(t*max(|A|,|B|)) elements,
    so their rarity-ordered prefixes cannot be disjoint — every true
    pair survives (completeness asserted against the exhaustive path in
    tests; the oracle is the brute-force definition, so losing a pair is
    a hash mismatch, not a silent recall drop).

    Why this is THE shape at 100 TB: the candidate join keys are each
    document's RAREST grams — the df-ordered prefix structurally avoids
    the stop-gram skew that forces ngram_jaccard_pairs' df cap, and the
    join fan-out per gram is bounded by that gram's (low) df. The size
    filter (t*|A| <= |B| <= |A|/t) prunes cross-length candidates before
    the distinct. Verify touches only candidate survivors via the shared
    broadcast set join."""
    from pyspark.sql.window import Window

    # NOTE: the gram table feeds three consumers (df count, sizes, rank
    # join) and is deliberately NOT checkpointed — measured 6.77s ->
    # 6.65s (noise) at sf0.1, and at real scale materializing the full
    # gram table in executor storage costs more than re-running a
    # codegen scan+hash; the bounded tables below (prefix, cand, sets)
    # ARE checkpointed.
    grams = fan_out(corpus).select(
        "doc_id",
        F.explode(
            F.transform(
                word_ngrams(F.col("text"), n), lambda g: md5_hash64(g)
            )
        ).alias("gram"),
    )
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gram"))
    prefix = (
        grams.join(dfreq, "gram")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select("doc_id", "gram", "sz")
        .localCheckpoint()
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "gram")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") * F.lit(threshold) <= F.col("b.sz"))
            & (F.col("b.sz") * F.lit(threshold) <= F.col("a.sz"))
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
        .localCheckpoint()
    )
    return _verify_against_corpus(
        corpus,
        cand,
        F.transform(word_ngrams(F.col("text"), n), lambda g: md5_hash64(g)),
        threshold,
    )


# ---------------------------------------------------------------------------
# Maintained minhash signature store (the S7 postings-store discipline
# applied to the dedup family: signatures are written at ingest, and a
# new batch dedups against the store without re-signing the corpus)
# ---------------------------------------------------------------------------

def read_signature_store(
    spark, store_path: str, n_hashes: int = N_MINHASHES
) -> DataFrame:
    """The maintained (doc_id, v0..v{n-1}) signature table; empty-typed
    frame if the store does not exist yet. Like bm25.read_postings, only
    a MISSING store reads as empty — an unreadable one must abort the
    update loudly (update rewrites the store as kept ∪ delta, so
    treating a corrupt read as empty would truncate the index)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    cols = ", ".join(f"v{j} long" for j in range(n_hashes))
    return spark.createDataFrame([], f"doc_id long, {cols}")


def update_signature_store(
    spark,
    store_path: str,
    changed_docs: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    n_hashes: int = N_MINHASHES,
    shingle_k: int = 5,
) -> None:
    """Incremental signature maintenance: drop the signatures of
    changed/deleted docs (one anti-join on doc_id), append freshly
    computed signatures of the changed docs only. INVARIANT (asserted
    in tests): after any update sequence the store equals
    minhash_signatures() over the current corpus — incremental ==
    rebuild, so incremental_neardup off the store is exact. The touched
    set is delta-sized; at production scale this is a Delta MERGE."""
    from ..store_util import overwrite_store, union_keys

    overwrite_store(
        store_path,
        read_signature_store(spark, store_path, n_hashes),
        "doc_id",
        gone=union_keys("doc_id", changed_docs, deleted_ids),
        fresh=(
            minhash_signatures(changed_docs, n_hashes, shingle_k)
            if changed_docs is not None
            else None
        ),
    )


def incremental_neardup(
    spark,
    store_path: str,
    corpus: DataFrame,
    new_ids: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    shingle_k: int = 5,
    n_hashes: int = N_MINHASHES,
) -> DataFrame:
    """(id_a, id_b, jaccard) — near-dups INVOLVING the new batch, found
    against the maintained store: band buckets of the new docs' stored
    signatures (batch-sized, broadcast) join the full bucket table, so
    candidate generation touches only buckets a new doc lands in — the
    corpus is never re-signed and never self-joined. Exact verify runs
    over the corpus texts for just the candidate ids (the shared
    exact_verify_pairs funnel). Equals the batch minhash_lsh_neardup
    restricted to pairs touching a new id (asserted in tests)."""
    sigs = read_signature_store(spark, store_path, n_hashes).localCheckpoint()
    new_sigs = sigs.join(
        F.broadcast(new_ids.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    buckets = lsh_band_buckets(sigs, n_hashes=n_hashes)
    new_buckets = lsh_band_buckets(new_sigs, n_hashes=n_hashes)
    cand = (
        buckets.join(
            F.broadcast(
                new_buckets.select(
                    "band", "bucket", F.col("doc_id").alias("new_id")
                )
            ),
            ["band", "bucket"],
        )
        .filter(F.col("doc_id") != F.col("new_id"))
        .select(
            F.least("doc_id", "new_id").alias("id_a"),
            F.greatest("doc_id", "new_id").alias("id_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    return exact_verify_pairs(corpus, cand, threshold, shingle_k)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    corpus: DataFrame, bits: int = SIMHASH_BITS, terms: DataFrame | None = None
) -> DataFrame:
    """(doc_id, simhash) — tf-weighted Charikar fingerprint over BM25 tokens.
    Integer-exact (tf sums), so bit-identical across engines and reruns.
    ``terms`` accepts the maintained (doc_id, term, tf) postings table."""
    if terms is not None:
        tf = terms
    else:
        toks = fan_out(corpus).select(
            "doc_id", F.explode(tokenize_bm25(F.col("text"))).alias("term")
        )
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    th = tf.withColumn("h", md5_hash64(F.col("term"), salt="t|"))
    bit_sums = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = th.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_neardup(
    corpus: DataFrame,
    max_hamming: int = HAMMING_THRESHOLD,
    bands: int = SIMHASH_BANDS,
    terms: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within hamming <= 3 of the 32-bit
    simhash. Candidates via the pigeonhole band trick: <= 3 differing bits
    across 4 bands → at least one 8-bit band identical, so the band
    equi-join finds every true pair without an N² cross product.
    `signatures` (doc_id, simhash) bypasses the text hashing — used by the
    completeness property test to check the band trick against ground
    truth on arbitrary signatures."""
    sim = simhash(corpus, terms=terms) if signatures is None else signatures
    band_width = SIMHASH_BITS // bands
    mask = (1 << band_width) - 1
    # one inline explode, not a bands-way union of scans (r13, guide
    # §2.3): identical rows, and the saving doubles because BOTH sides
    # of the band self-join below carry this subtree
    per_band = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.shiftright(F.col("simhash"), k * band_width)
                .bitwiseAND(F.lit(mask))
                .alias("bk"),
            )
            for k in range(bands)
        ]
    )
    bs = sim.select(
        "doc_id", "simhash", F.explode(per_band).alias("__kb")
    ).select(
        "doc_id",
        "simhash",
        F.col("__kb.k").alias("k"),
        F.col("__kb.bk").alias("bk"),
    )
    cand = (
        bs.alias("a")
        .join(bs.alias("b"), ["k", "bk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def with_perturbed_vectors(emb: DataFrame, modulo: int = 10) -> DataFrame:
    """embeddings ∪ perturbed copies (first component ×1.01) as double
    arrays — cosine(orig, copy) ≈ 0.9999."""
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == 0, x.cast("double") * 1.01).otherwise(
            x.cast("double")
        ),
    )
    orig = emb.select("vec_id", "label", as_double.alias("e"))
    copies = emb.filter(F.col("vec_id") % modulo == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "label", perturbed.alias("e")
    )
    return orig.unionByName(copies)


def survivors(
    corpus: DataFrame, pairs: DataFrame, n_iters: int = 15
) -> DataFrame:
    """(doc_id, canonical_id, is_survivor) — the dedup DECISION table a
    training pipeline actually materializes: near-dup pairs form an
    undirected graph, canonical_id = min doc id of each component
    (min-label propagation, duplicate-insensitive and order-free), and
    exactly one row per component keeps is_survivor = true. Docs in no
    pair are their own canonical. n_iters is matched between this and the
    oracle, so parity holds by construction at any diameter.

    100 TB shape: pair generation is the (already bucketed) near-dup
    operator; the label rounds are join + min-groupBy on the PAIR graph
    only (tiny vs the corpus); the final label join is a plain equi-join
    on doc_id — AQE broadcasts it when the dup set is small, shuffles
    when it is not (no unbounded-broadcast assumption)."""
    from .graph import connected_components

    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(edges, n_iters=n_iters).withColumnRenamed(
        "node_id", "doc_id"
    )
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn("is_survivor", F.col("doc_id") == F.col("canonical_id"))
    )


def embedding_neardup(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    block_col: str = "label",
) -> DataFrame:
    """(id_a, id_b, cos_sim) — cosine >= threshold within blocks. Blocking
    turns the O(N²) cross join into Σ block² — at 100 TB the block key is an
    LSH bucket or IVF centroid id instead of a label, same plan shape."""
    from ..functions.vectors import dot, norm

    # per-VECTOR norms ride each join side (r13, guide §2.3): the norm
    # fold runs once per vector instead of once per pair side —
    # bit-identical, cosine = dot/(norm(a)*norm(b)) with the same folds
    corpus = with_perturbed_vectors(emb)
    a = corpus.select(
        F.col(block_col),
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        norm(F.col("e")).alias("na"),
    )
    b = corpus.select(
        F.col(block_col),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        norm(F.col("e")).alias("nb"),
    )
    return (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def semdedup(
    emb: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.97,
    centroid_mode: str = "deterministic",
    sample_frac: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, cluster_id, is_kept, dropped_for) — SemDeDup (Abbas et al.
    2023, arXiv:2303.09540): partition the embedding space by nearest
    centroid, then within each cluster drop every point that has a
    semantically near-identical neighbour (cosine >= threshold) with a
    smaller id; the min-id exemplar of each near-set survives
    (dropped_for = that exemplar, NULL for keepers).

    Two centroid sources, same plan shape (broadcast-centroid argmax
    assign + within-block self-join):

      centroid_mode="deterministic" (default — oracle parity, no
        training pass): centroid j = the corpus vector with vec_id == j.
      centroid_mode="kmeans": seeded MLlib KMeans over a sample_frac
        sample of the corpus (ann.train_ivf_centroids) — the production
        path at 100 TB, where centroids come from ~1% of rows and
        n_centroids grows ~√N to keep cluster populations (and the
        self-join) bounded.

    SemDeDup's own ablation finds cluster QUALITY barely matters — the
    clustering is a proximity BLOCK that turns the O(N²) pairwise scan
    into Σ cluster²; any stable partitioner works
    (test_dedup_semantic asserts both modes keep the same survivors on
    the synthetic corpus).
    """
    from pyspark.sql.window import Window

    from ..functions.vectors import cosine, dot, norm

    corpus = with_perturbed_vectors(emb)
    if centroid_mode == "kmeans":
        from .ann import train_ivf_centroids

        train_src = (
            corpus.sample(fraction=sample_frac, seed=seed)
            if sample_frac < 1.0
            else corpus
        )
        cents = train_ivf_centroids(
            train_src.select("vec_id", F.col("e").alias("embedding")),
            n_cells=n_centroids,
            vec_col="embedding",
            seed=seed,
        ).select(
            F.col("cell_id").alias("cluster_id"),
            F.col("embedding").alias("ce"),
        )
    elif centroid_mode == "deterministic":
        cents = corpus.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cluster_id"), F.col("e").alias("ce")
        )
    else:
        raise ValueError(
            f"unknown centroid_mode {centroid_mode!r}; "
            "expected 'deterministic' or 'kmeans'"
        )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("cluster_id")
    )
    # Materialized once: the assignment feeds BOTH sides of the pair
    # self-join AND the final decision join — without a checkpoint Spark
    # re-derives the broadcast-argmax subtree three times. This is the
    # "persist cluster assignments" step every SemDeDup pipeline has; at
    # 100 TB it is a written intermediate table, not a recompute.
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", cosine(F.col("e"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "e")
        .localCheckpoint()
    )
    # per-vector norms on each side (r13): one norm fold per vector,
    # not per pair side — bit-identical to cosine()
    a = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        norm(F.col("e")).alias("na"),
    )
    b = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        norm(F.col("e")).alias("nb"),
    )
    dominated = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            >= threshold
        )
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.min("id_a").alias("dropped_for"))
    )
    return (
        assigned.join(dominated, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.col("dropped_for").isNull().alias("is_kept"),
            "dropped_for",
        )
    )


def repeated_spans(
    docs: DataFrame,
    span_len: int = 60,
    stride: int = 30,
    min_occ: int = 2,
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_frac) — exact repeated-substring
    duplication statistics (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499): slide a
    span_len-char window with `stride` over every document and count, per
    document, how many of its spans occur verbatim >= min_occ times in
    the whole corpus (within-doc repeats count, like the paper's
    suffix-array substring counts). dup_frac = n_dup_spans / n_spans is
    the per-doc signal the usual drop/trim rules key on; docs shorter
    than span_len have 0 spans and dup_frac 0.

    Scale: the paper's suffix array is replaced by the shuffle-friendly
    equivalent — explode to (span, doc_id), aggregate keyed on the span,
    equi-join back. Spans here join on the raw string for oracle
    bit-parity; at 100 TB the join key is xxhash64(span) (8 bytes vs 60)
    and the per-span count uses the standard two-stage partial aggregate,
    so a span repeated millions of times never concentrates one reducer.
    """
    d = docs.select("doc_id", "text").withColumn(
        "n_off",
        F.when(
            F.length("text") >= span_len,
            ((F.length("text") - span_len) / stride).cast("int") + 1,
        ).otherwise(F.lit(0)),
    )
    spans = d.filter(F.col("n_off") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, n_off), "
                f"i -> substring(text, (i-1)*{stride}+1, {span_len}))"
            )
        ).alias("span"),
    )
    occ = fan_out(spans).groupBy("span").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        spans.join(occ, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("n_occ") >= min_occ, 1).otherwise(0)
            ).alias("n_dup_spans"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.when(
                F.col("n_spans") > 0,
                F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
            ).otherwise(F.lit(0.0)),
        )
    )


def boilerplate_lines(
    lines: DataFrame, min_docs: int = 3, limit: int = 100
) -> DataFrame:
    """(content, n_docs, n_occurrences) — corpus-level line-frequency
    boilerplate detection (the C4 / The-Stack line-dedup rule: a line
    recurring across many documents is template/boilerplate, not content).
    Lines appearing in >= min_docs DISTINCT documents, most widespread
    first, `content` ASC tiebreak (deterministic; content is unique per
    group).

    Scale shape: count_distinct plans as two aggregates — the first keyed
    on (content, doc_id), so a line shared by millions of documents never
    concentrates on one partition; the final ordered top-`limit` is a
    TakeOrdered, not a global sort."""
    agg = fan_out(lines).groupBy("content").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return (
        agg.filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.asc("content"))
        .limit(limit)
    )


def strip_boilerplate(lines: DataFrame, min_docs: int = 3) -> DataFrame:
    """The lines table minus every boilerplate line (all occurrences,
    C4-style removal). Left-anti equi-join on content; the boilerplate
    aggregate is usually small but can reach millions of lines in a large
    code corpus, so the broadcast decision is left to AQE rather than
    forced."""
    boiler = (
        fan_out(lines)
        .groupBy("content")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("content")
    )
    return lines.join(boiler, "content", "left_anti").select(*lines.columns)


def cross_source_overlap(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(source_a, source_b, n_pairs, avg_jaccard) — near-dup pairs rolled
    up to the source x source overlap matrix (source_a <= source_b): the
    report a mixture build reads to spot cross-corpus contamination and
    set dedup-aware mixture weights (the standard companion table to the
    per-pair dedup output in large-scale corpus audits).

    `pairs` is any (id_a, id_b, jaccard) near-dup table; synthetic
    near-copy ids (>= 2000000, with_near_copies) map back to the original
    document's source. Scale: two equi-joins against the (doc_id, source)
    dimension + one groupBy on the bounded sources^2 key space — the
    matrix never outgrows the square of the source COUNT, regardless of
    corpus size."""

    def norm(c):
        return F.when(
            F.col(c) >= NEAR_COPY_OFFSET, F.col(c) - NEAR_COPY_OFFSET
        ).otherwise(F.col(c))

    src = docs.select("doc_id", "source")
    p = pairs.select(
        norm("id_a").alias("da"), norm("id_b").alias("db"), "jaccard"
    )
    j = (
        p.join(
            src.select(
                F.col("doc_id").alias("da"), F.col("source").alias("sa")
            ),
            "da",
        ).join(
            src.select(
                F.col("doc_id").alias("db"), F.col("source").alias("sb")
            ),
            "db",
        )
    )
    # average in exact integer micro-units: float partial sums are
    # order-dependent across partitions and a mean landing on a rounding
    # boundary flips the 6th decimal between engines; integer sums are
    # exact, so the final division + round is bit-identical to the oracle
    jm = F.round(F.col("jaccard") * 1e6).cast("bigint")
    return (
        j.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(jm).cast("double")
                / (F.count(F.lit(1)) * F.lit(1e6)),
                6,
            ).alias("avg_jaccard"),
        )
    )


def quality_survivors(
    corpus: DataFrame,
    pairs: DataFrame,
    score: Column | None = None,
    n_iters: int = 15,
) -> DataFrame:
    """(doc_id, canonical_id, is_survivor) — survivor selection that keeps
    the BEST member of each near-dup component instead of the min-id one:
    the curation policy real pipelines use (keep the longest / highest-
    quality variant; near-copies here are truncations, so length is the
    right default score and the un-truncated original wins its cluster).

    canonical_id stays the component label (min id — stable, order-free);
    only the survivor CHOICE differs from survivors(): argmax by
    (score desc, doc_id asc) via one row_number window over the labeled
    table — a per-component top-1, the WindowGroupLimit-friendly shape.
    Exactly one survivor per component by row_number's total order."""
    base = survivors(corpus, pairs, n_iters=n_iters).select(
        "doc_id", "canonical_id"
    )
    s = score if score is not None else F.length(F.col("text"))
    scored = base.join(
        corpus.select("doc_id", s.alias("__score")), "doc_id"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("__score"), F.asc("doc_id")
    )
    return scored.select(
        "doc_id",
        "canonical_id",
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )


def contrastive_pairs(
    emb: DataFrame,
    pos_threshold: float = COSINE_DUP_THRESHOLD,
    neg_lo: float = 0.3,
    neg_hi: float = 0.8,
    block_col: str = "label",
    per_anchor: int = 1,
) -> DataFrame:
    """(anchor_id, pos_id, pos_cos, neg_id, neg_cos) — contrastive
    training triplets mined from the corpus, the artifact an
    embedding-model training pipeline actually consumes: positives are
    within-block near-duplicate pairs (cosine >= pos_threshold, anchor =
    the smaller id — the embedding_neardup pair set verbatim), and each
    anchor's HARD NEGATIVES are same-block vectors with cosine in
    [neg_lo, neg_hi) — close enough to be informative, far enough to be
    true negatives (the standard mined-hard-negative recipe: Karpukhin
    et al. 2020 DPR §4.2, Gao et al. 2021 SimCSE). Deterministic: top
    per_anchor negatives by (cos DESC, id ASC); anchors with a positive
    but no in-band negative are dropped (inner join) — a triplet without
    a hard negative is not a training example.

    Scale shape: ONE blocked self-join (the embedding_neardup blocking —
    label here, an IVF cell id at 100 TB, Σ block² never N²) computed
    once and reused by both legs; the negative leg adds one per-anchor
    row_number window over in-band candidates only. pos_threshold >
    neg_hi guarantees a vector never serves as both positive and
    negative for the same anchor."""
    from pyspark.sql.window import Window

    from ..functions.vectors import dot, norm

    if neg_hi > pos_threshold:
        raise ValueError(
            f"contrastive_pairs: neg_hi ({neg_hi}) must not exceed "
            f"pos_threshold ({pos_threshold}) — a vector could serve as "
            "both positive and negative"
        )
    corpus = with_perturbed_vectors(emb)
    # per-vector norms on each side (r13): one norm fold per vector,
    # not per pair side — bit-identical to cosine()
    a = corpus.select(
        F.col(block_col),
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        norm(F.col("e")).alias("na"),
    )
    b = corpus.select(
        F.col(block_col),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        norm(F.col("e")).alias("nb"),
    )
    pairs = (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
        )
        .select("id_a", "id_b", "cos_sim")
        .localCheckpoint()
    )
    pos = pairs.filter(F.col("cos_sim") >= pos_threshold).select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("pos_id"),
        F.round("cos_sim", 6).alias("pos_cos"),
    )
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("nid"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("nid"),
            "cos_sim",
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_sim"), F.asc("nid")
    )
    neg = (
        sym.filter(
            (F.col("cos_sim") >= neg_lo) & (F.col("cos_sim") < neg_hi)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_anchor)
        .select(
            "anchor_id",
            F.col("nid").alias("neg_id"),
            F.round("cos_sim", 6).alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "pos_id", "pos_cos", "neg_id", "neg_cos"
    )


def dup_span_removal(
    docs: DataFrame,
    span_len: int = 60,
    stride: int = 30,
    min_occ: int = 2,
) -> DataFrame:
    """(doc_id, n_spans_removed, removed_chars, trimmed_text) — the
    REMOVAL half of exact substring deduplication (Lee et al. 2021,
    arXiv:2107.06499 §4: delete every duplicated substring from the
    corpus, KEEPING ONE canonical occurrence): repeated_spans computes
    the per-doc duplication statistics; this emits the cleaned corpus.

    Window scheme: the same span_len-char windows at `stride` as
    repeated_spans. A window whose text occurs >= min_occ times in the
    corpus is removed from every document EXCEPT its canonical
    occurrence — the (lowest doc_id, lowest offset) one, so exactly one
    copy survives corpus-wide and the output is deterministic. Within a
    doc, marked windows merge into maximal spans (overlapping or
    adjacent ranges coalesce), and the trimmed text is the ordered
    concatenation of the kept segments. Docs with nothing removed pass
    through verbatim (stride coarser than 1 approximates the paper's
    suffix-array maximality: a duplicated region is trimmed to window
    granularity — the standard practical relaxation).

    Plan shape: one window explode ((len/stride) x corpus rows); the
    canonical pick is a MAP-SIDE-COMBINABLE ``min(struct(doc_id, off))``
    (structs order lexicographically; partial min combines map-side) —
    deliberately NOT a row_number over the span partition, which a
    boilerplate span repeated 1e8 times would turn into a
    single-reducer skew. The struct key is exact for ANY int64 doc_id /
    offset (the earlier packed ``doc_id*2^31+off`` long broke silently
    for doc_id >= 2^32 or negative ids). Island merging and segment
    reconstruction are window functions over the doc_id partitioning
    (one shuffle, reused)."""
    from pyspark.sql.window import Window

    d = docs.select("doc_id", "text").withColumn(
        "n_off",
        F.when(
            F.length("text") >= span_len,
            ((F.length("text") - span_len) / stride).cast("int") + 1,
        ).otherwise(F.lit(0)),
    )
    wins = d.filter(F.col("n_off") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, n_off), "
                f"i -> named_struct("
                f"'off', cast((i-1)*{stride}+1 as long), "
                f"'span', substring(text, (i-1)*{stride}+1, {span_len})))"
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.off").alias("off"), F.col("w.span").alias("span"))
    occ = fan_out(wins).groupBy("span").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "off")).alias("canon_key"),
    )
    marked = (
        wins.join(occ, "span")
        .filter(
            (F.col("n_occ") >= min_occ)
            & (F.struct("doc_id", "off") != F.col("canon_key"))
        )
        .select(
            "doc_id",
            F.col("off").alias("s"),
            (F.col("off") + F.lit(span_len - 1)).alias("e"),
        )
    )
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = marked.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        flagged.withColumn("isl", F.sum("new_island").over(run))
        .groupBy("doc_id", "isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    # kept segments between consecutive islands (+ head before the
    # first and tail after the last), same doc_id partitioning
    ord_w = Window.partitionBy("doc_id").orderBy("s")
    segs = (
        islands.withColumn("prev_e", F.lag("e").over(ord_w))
        .withColumn("rn_desc", F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("s"))
        ))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e") - F.col("s") + 1).alias("removed_chars"),
            F.count(F.lit(1)).alias("n_spans_removed"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("prev_e") + 1, F.lit(1)).alias(
                            "ks"
                        ),
                        (F.col("s") - 1).alias("ke"),
                    )
                )
            ).alias("kept"),
            F.max(F.when(F.col("rn_desc") == 1, F.col("e"))).alias(
                "last_e"
            ),
        )
    )
    trimmed = d.join(segs, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans_removed", F.lit(0))
        .cast("int")
        .alias("n_spans_removed"),
        F.coalesce("removed_chars", F.lit(0))
        .cast("long")
        .alias("removed_chars"),
        F.when(F.col("kept").isNull(), F.col("text"))
        .otherwise(
            F.concat(
                F.array_join(
                    F.transform(
                        F.col("kept"),
                        lambda k: F.expr("text").substr(
                            k["ks"].cast("int"), (k["ke"] - k["ks"] + 1).cast("int")
                        ),
                    ),
                    "",
                ),
                F.col("text").substr(
                    (F.col("last_e") + 1).cast("int"),
                    (F.length("text") - F.col("last_e")).cast("int"),
                ),
            )
        )
        .alias("trimmed_text"),
    )
    return trimmed
