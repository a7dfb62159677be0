"""DuckDB oracle SQL for every queries() entry in __spark_entry__.py.

Each SQL string runs on DuckDB with the testdata tables pre-registered as
views (region nation customer supplier part orders lineitem events documents
embeddings). The SQL is built from the SAME regex/formula fragments as the
Spark plans (functions/text.py, functions/vectors.py) so both engines compute
identical token streams and identical double-precision scores.

Convention: every float output column is round(x, 6) on BOTH sides; every
top-k is cut by (score DESC, id ASC) so membership is deterministic.
"""

from __future__ import annotations

from .functions.emit import micro6_sql
from .functions.hashing import duckdb_md5_hash64_sql
from .functions.text import LANG_MARKERS, duckdb_char_shingles_sql, duckdb_tokenize_sql
from .functions.vectors import duckdb_cosine_sql
from .sources.documents import duckdb_chunk_text_sql, duckdb_code_lines_sql

K1 = 1.2

# Shared CTE bodies ---------------------------------------------------------

def _tf_df_ctes(doc_table: str = "documents") -> str:
    toks = duckdb_tokenize_sql("text")
    return f"""
tok AS (SELECT doc_id, unnest({toks}) AS term FROM {doc_table}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {doc_table})
"""


def _sparse_scored_sql(query_terms: list[str], threshold: float, k: int) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
q AS (SELECT unnest([{terms}]) AS term),
sparse_scored AS (
  SELECT tf.doc_id,
         sum(greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
             * ({K1} * tf.tf) / (tf.tf + {K1})) AS score
  FROM tf JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN nn
  GROUP BY tf.doc_id
),
sparse_top AS (
  SELECT doc_id, score FROM sparse_scored WHERE score >= {threshold}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
"""


def _dense_scored_sql(query_vec_id: int, threshold: float, k: int) -> str:
    cos = duckdb_cosine_sql("embedding", "qe")
    return f"""
qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
dense_scored AS (
  SELECT vec_id, {cos} AS score FROM embeddings CROSS JOIN qv
),
dense_top AS (
  SELECT vec_id, score FROM dense_scored WHERE score >= {threshold}
  ORDER BY score DESC, vec_id ASC LIMIT {k}
)
"""


# Per-query oracles ----------------------------------------------------------

def bm25_sparse_topk(query_terms: list[str], threshold: float = 0.15, k: int = 20) -> str:
    return f"""
WITH {_tf_df_ctes()}, {_sparse_scored_sql(query_terms, threshold, k)}
SELECT doc_id, round(score, 6) AS score FROM sparse_top
"""


def dense_knn_cosine(query_vec_id: int = 0, threshold: float = 0.3, k: int = 20) -> str:
    return f"""
WITH {_dense_scored_sql(query_vec_id, threshold, k)}
SELECT vec_id, round(score, 6) AS score FROM dense_top
"""


def hybrid_search_rrf(
    query_terms: list[str],
    query_vec_id: int = 0,
    limit: int = 10,
    threshold: float = 0.3,
) -> str:
    return f"""
WITH {_tf_df_ctes()},
{_sparse_scored_sql(query_terms, threshold * 0.5, 2 * limit)},
{_dense_scored_sql(query_vec_id, threshold, 2 * limit)},
sem AS (SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY score DESC, vec_id ASC) - 1 AS rnk
        FROM dense_top),
kw AS (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rnk
       FROM sparse_top),
fused AS (
  SELECT doc_id, sum(1.0 / (60 + rnk + 1)) AS score
  FROM (SELECT * FROM sem UNION ALL SELECT * FROM kw) u
  GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT {limit}
"""


def corpus_stats() -> str:
    return f"""
WITH {_tf_df_ctes()}
SELECT term, df,
       round(greatest(0.0, ln((nn.n - df + 0.5) / (df + 0.5))), 6) AS idf
FROM dfreq CROSS JOIN nn
"""


def hapax_eviction() -> str:
    """R5: df==1 terms evicted; hx<doc_id> synthetic hapaxes must vanish."""
    toks = duckdb_tokenize_sql("text")
    return f"""
WITH aug AS (
  SELECT doc_id, text || ' hx' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
),
tok AS (SELECT doc_id, unnest({toks}) AS term FROM aug),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT term, df FROM dfreq WHERE df > 1
"""


def relevance_decay_hybrid(
    query_terms: list[str],
    decay_map: dict[str, float],
    query_vec_id: int = 0,
    limit: int = 10,
    threshold: float = 0.3,
    default_mult: float = 0.4,
) -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN {m}" for t, m in sorted(decay_map.items())
    )
    mult = f"(CASE d.source {whens} ELSE {default_mult} END)"
    return f"""
WITH {_tf_df_ctes()},
{_sparse_scored_sql(query_terms, threshold * 0.5, 2 * limit)},
{_dense_scored_sql(query_vec_id, threshold, 2 * limit)},
kw_dec AS (
  SELECT s.doc_id, s.score * {mult} AS score
  FROM sparse_top s LEFT JOIN documents d USING (doc_id)
),
sem_dec AS (
  SELECT t.vec_id AS doc_id, t.score * {mult} AS score
  FROM dense_top t LEFT JOIN documents d ON d.doc_id = t.vec_id
),
sem AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rnk FROM sem_dec),
kw AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rnk FROM kw_dec),
fused AS (
  SELECT doc_id, sum(1.0 / (60 + rnk + 1)) AS score
  FROM (SELECT * FROM sem UNION ALL SELECT * FROM kw) u
  GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT {limit}
"""


def diversity_rerank(query_vec_id: int = 0, k: int = 40) -> str:
    """Sequential score-tiering (tier top resets when |top-score| > 0.05) is
    inherently order-dependent → expressed as a linear recursive CTE; the
    round-robin interleave + per-source cap + spillover backfill reduce to
    window functions over (tier, pos_in_src, src_first)."""
    cos = duckdb_cosine_sql("embedding", "qe")
    return f"""
WITH RECURSIVE
qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT vec_id, 'embeddings:' || CAST(label AS VARCHAR) AS src, {cos} AS score
  FROM embeddings CROSS JOIN qv
),
topk AS (
  SELECT vec_id, src, score FROM scored WHERE score >= 0.0
  ORDER BY score DESC, vec_id ASC LIMIT {k}
),
cand AS (
  SELECT vec_id, src, score,
         row_number() OVER (ORDER BY score DESC, vec_id ASC) - 1 AS rn
  FROM topk
),
tiers(rn, tier, top) AS (
  SELECT rn, 1, score FROM cand WHERE rn = 0
  UNION ALL
  SELECT c.rn,
         CASE WHEN abs(t.top - c.score) <= 0.05 THEN t.tier ELSE t.tier + 1 END,
         CASE WHEN abs(t.top - c.score) <= 0.05 THEN t.top ELSE c.score END
  FROM tiers t JOIN cand c ON c.rn = t.rn + 1
),
x AS (SELECT c.vec_id, c.src, c.rn, t.tier FROM cand c JOIN tiers t USING (rn)),
y AS (
  SELECT *,
         row_number() OVER (PARTITION BY tier, src ORDER BY rn) AS pos_in_src,
         min(rn) OVER (PARTITION BY tier, src) AS src_first
  FROM x
),
z AS (
  SELECT *,
         row_number() OVER (PARTITION BY src ORDER BY tier, pos_in_src, src_first)
           AS src_seq
  FROM y
)
SELECT vec_id,
       row_number() OVER (ORDER BY (src_seq > 3), tier, pos_in_src, src_first) - 1
         AS final_pos
FROM z
"""


def exact_match_scoring(pattern: str, limit: int = 100) -> str:
    return f"""
WITH m AS (SELECT doc_id FROM documents WHERE instr(lower(text), '{pattern}') > 0),
r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) - 1 AS idx FROM m)
SELECT doc_id, round(1.0 - idx * CAST(0.001 AS DOUBLE), 6) AS score
FROM r WHERE idx < {limit}
"""


def grep_count(pattern: str) -> str:
    return f"""
SELECT count(*) AS n_matches FROM documents WHERE instr(lower(text), '{pattern}') > 0
"""


def dedup_exact() -> str:
    return """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
"""


def grep_exact_lines(pattern: str, max_results: int = 1000) -> str:
    return f"""
WITH {duckdb_code_lines_sql()}
SELECT doc_id, line_number, content FROM lines
WHERE instr(content, '{pattern}') > 0
ORDER BY doc_id ASC, line_number ASC LIMIT {max_results}
"""


def grep_regex_lines(pattern: str, max_results: int = 1000) -> str:
    return f"""
WITH {duckdb_code_lines_sql()}
SELECT doc_id, line_number, content FROM lines
WHERE regexp_matches(content, '{pattern}')
ORDER BY doc_id ASC, line_number ASC LIMIT {max_results}
"""


def grep_context_lines(pattern: str) -> str:
    return f"""
WITH {duckdb_code_lines_sql()},
l2 AS (
  SELECT doc_id, line_number, content,
         coalesce(lag(content) OVER (PARTITION BY doc_id ORDER BY line_number), '')
           AS context_before,
         coalesce(lead(content) OVER (PARTITION BY doc_id ORDER BY line_number), '')
           AS context_after
  FROM lines
)
SELECT doc_id, line_number, content, context_before, context_after
FROM l2 WHERE instr(content, '{pattern}') > 0
"""


def chunk_text() -> str:
    return f"""
WITH {duckdb_chunk_text_sql()}
SELECT doc_id, chunk_index, content FROM chunks
"""


def lang_id() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(toks, t -> list_contains([{markers}], t))) AS s_{lang}"
        )
    # argmax with ascending-code tiebreak — mirrors the Spark fold in
    # textstats.lang_id exactly (later lang wins only on strictly greater).
    case = (
        "CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr' "
        "WHEN s_es > greatest(s_de, s_en) THEN 'es' "
        "WHEN s_en > s_de THEN 'en' ELSE 'de' END"
    )
    return f"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)
           AS toks
  FROM documents
),
scores AS (SELECT doc_id, {', '.join(score_cols)} FROM tokd)
SELECT doc_id, {case} AS lang_pred FROM scores
"""


def quality_score() -> str:
    stop = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])
    return f"""
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
           AS n_punct,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)
           AS toks
  FROM documents
),
r AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         n_punct / greatest(n_chars, 1) AS punct_ratio,
         len(list_filter(toks, t -> list_contains([{stop}], t)))
           / greatest(len(toks), 1) AS stopword_ratio,
         (n_chars - len(toks) + 1) / greatest(len(toks), 1) AS mean_word_len
  FROM feats
)
SELECT doc_id, n_tokens,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_word_len, 6) AS mean_word_len,
       round(CASE WHEN n_tokens < 20
                  THEN (0.5 * stopword_ratio + 0.5 * (1.0 - punct_ratio)) * 0.5
                  ELSE 0.5 * stopword_ratio + 0.5 * (1.0 - punct_ratio) END,
             6) AS quality
FROM r
"""


_NEAR_COPY_CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, substr(text, 1, length(text) - 25) AS text
  FROM documents WHERE doc_id % 7 = 0
)
"""


def _ngram_pair_ctes(
    n: int = 3, threshold: float = 0.5, max_df_frac: float = 0.5
) -> str:
    """CTE chain over a `corpus`(doc_id, text) CTE ending in
    `jpairs`(id_a, id_b, jaccard >= threshold) — shared by the
    ngram_jaccard, dedup_survivors and cross_source_overlap oracles.
    Mirrors dedup.ngram_jaccard_pairs exactly, INCLUDING the stop-gram
    frequency cap: grams in > max_df_frac of the corpus are dropped
    before the pair join and sizes are recomputed over kept grams."""
    gram_i = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return f"""
wd AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS w
  FROM corpus
),
gs AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {n}
              THEN list_distinct(list_transform(
                     generate_series(1, len(w) - {n - 1}), i -> {gram_i}))
              ELSE [] END AS grams
  FROM wd
),
g0 AS (SELECT doc_id,
              unnest(list_transform(grams,
                x -> {duckdb_md5_hash64_sql('x')})) AS gram
       FROM gs),
nd AS (SELECT count(*) AS n_docs FROM corpus),
stopg AS (
  SELECT gram FROM g0, nd GROUP BY gram, n_docs
  HAVING count(*) > {max_df_frac} * n_docs
),
g AS (SELECT g0.* FROM g0 ANTI JOIN stopg USING (gram)),
prs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
jpairs AS MATERIALIZED (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (sa.n_grams + sb.n_grams - inter) AS jaccard
  FROM prs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.n_grams + sb.n_grams - inter)
        >= {threshold}
)"""


def cross_source_overlap(n: int = 3, threshold: float = 0.5) -> str:
    """Oracle for dedup.cross_source_overlap over the n-gram-Jaccard
    pairs: near-copy ids fold back to the original doc's source, matrix
    keyed (least, greatest) source pair."""
    return f"""
WITH {_NEAR_COPY_CORPUS},
{_ngram_pair_ctes(n, threshold)},
folded AS (
  SELECT CASE WHEN id_a >= 2000000 THEN id_a - 2000000 ELSE id_a END AS da,
         CASE WHEN id_b >= 2000000 THEN id_b - 2000000 ELSE id_b END AS db,
         jaccard
  FROM jpairs
)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       count(*) AS n_pairs,
       -- exact integer micro-unit average (mirrors the Spark side):
       -- float partial sums are order-dependent; integer sums are not
       round(CAST(sum(CAST(round(round(jaccard, 6) * 1000000) AS BIGINT))
                  AS DOUBLE) / (count(*) * 1000000.0), 6) AS avg_jaccard
FROM folded
JOIN documents sa ON sa.doc_id = folded.da
JOIN documents sb ON sb.doc_id = folded.db
GROUP BY 1, 2
"""


def _survivor_label_ctes(n: int, threshold: float, n_iters: int) -> str:
    """CTE chain corpus -> jpairs -> min-label CC rounds, ending in
    l{n_iters}(node_id, component) — shared by the min-id and
    quality-argmax survivor oracles."""
    parts = [
        f"WITH {_NEAR_COPY_CORPUS},",
        _ngram_pair_ctes(n, threshold),
        """,
und AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jpairs
  UNION SELECT id_b, id_a FROM jpairs
),
l0 AS MATERIALIZED (SELECT doc_id AS node_id, doc_id AS component FROM corpus)""",
    ]
    for i in range(n_iters):
        parts.append(
            f""",
m{i} AS (
  SELECT u.dst AS node_id, min(l.component) AS nbr
  FROM und u JOIN l{i} l ON l.node_id = u.src GROUP BY u.dst
),
l{i + 1} AS MATERIALIZED (
  SELECT l.node_id, least(l.component, coalesce(m.nbr, l.component)) AS component
  FROM l{i} l LEFT JOIN m{i} m USING (node_id)
)"""
        )
    return "".join(parts)


def dedup_survivors(n: int = 3, threshold: float = 0.5, n_iters: int = 15) -> str:
    """Dedup decision table (operators/dedup.survivors): canonical id per
    near-dup component via n_iters matched min-label rounds over the
    n-gram-Jaccard pair graph; docs in no pair are their own canonical."""
    return (
        _survivor_label_ctes(n, threshold, n_iters)
        + f"""
SELECT node_id AS doc_id, component AS canonical_id,
       node_id = component AS is_survivor
FROM l{n_iters}"""
    )


def quality_survivors(n: int = 3, threshold: float = 0.5, n_iters: int = 15) -> str:
    """Oracle for operators/dedup.quality_survivors: same CC labels, but
    the survivor is the component's argmax by (length(text) DESC,
    doc_id ASC) — keep-the-longest-variant curation policy."""
    return (
        _survivor_label_ctes(n, threshold, n_iters)
        + f"""
SELECT l.node_id AS doc_id, l.component AS canonical_id,
       row_number() OVER (
         PARTITION BY l.component
         ORDER BY length(c.text) DESC, l.node_id ASC
       ) = 1 AS is_survivor
FROM l{n_iters} l JOIN corpus c ON c.doc_id = l.node_id"""
    )


def ngram_jaccard(n: int = 3, threshold: float = 0.5) -> str:
    return f"""
WITH {_NEAR_COPY_CORPUS},
{_ngram_pair_ctes(n, threshold)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jpairs
"""


def prefix_jaccard(n: int = 3, threshold: float = 0.5) -> str:
    """Oracle for dedup.prefix_jaccard_pairs: the BRUTE-FORCE definition
    (full inverted index, no df cap — max_df_frac=1.0 makes the stop set
    empty). Prefix filtering claims losslessness, so the optimized path
    must hash-match the exhaustive answer: a dropped pair is a driver
    mismatch, not a silent recall drop."""
    return f"""
WITH {_NEAR_COPY_CORPUS},
{_ngram_pair_ctes(n, threshold, max_df_frac=1.0)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jpairs
"""


def minhash_lsh_neardup(
    n_hashes: int = 16, bands: int = 4, shingle_k: int = 5, threshold: float = 0.5
) -> str:
    from .operators.dedup import MINHASH_MOD

    sh = duckdb_char_shingles_sql("text", shingle_k)
    h32 = f"({duckdb_md5_hash64_sql('s')} % {MINHASH_MOD})"
    return f"""
WITH {_NEAR_COPY_CORPUS},
sh AS (SELECT doc_id, unnest({sh}) AS s FROM corpus),
hh AS (SELECT doc_id, {h32} AS h32 FROM sh),
mh AS MATERIALIZED (
  SELECT doc_id, j,
         min(((97 + 12 * j) * h32 + (7 + 31 * j)) % {MINHASH_MOD}) AS v
  FROM hh, LATERAL unnest(generate_series(0, {n_hashes - 1})) AS t(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id, CAST(floor(j / {n_hashes // bands}) AS INT) AS band,
         md5(array_to_string(list(v ORDER BY j), ',')) AS bucket
  FROM mh GROUP BY doc_id, CAST(floor(j / {n_hashes // bands}) AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
sets AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform({sh},
           s -> {duckdb_md5_hash64_sql('s')} % {MINHASH_MOD})) AS ss
  FROM corpus
),
ver AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(x.ss, y.ss)) AS DOUBLE)
           / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) AS jaccard
  FROM cand
  JOIN sets x ON x.doc_id = id_a
  JOIN sets y ON y.doc_id = id_b
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM ver WHERE jaccard >= {threshold}
"""


def _simhash_cte(bits: int = 32) -> str:
    """CTE chain corpus→sim(doc_id, simhash). Expects a CTE named corpus."""
    toks = duckdb_tokenize_sql("text")
    h = duckdb_md5_hash64_sql("'t|' || term")
    return f"""
tok2 AS (SELECT doc_id, unnest({toks}) AS term FROM corpus),
tf2 AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
th AS (SELECT doc_id, term, tf, {h} AS h FROM tf2),
bitsums AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h & (CAST(1 AS BIGINT) << b)) <> 0 THEN tf ELSE -tf END) AS s
  FROM th, LATERAL unnest(generate_series(0, {bits - 1})) AS t(b)
  GROUP BY doc_id, b
),
sim AS (
  -- CAST: DuckDB widens sum(BIGINT) to HUGEINT; Spark returns BIGINT and
  -- the driver's correctness hash is type-sensitive (VERDICT r1 #2).
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)
           AS BIGINT) AS simhash
  FROM bitsums GROUP BY doc_id
)
"""


def simhash_fingerprints() -> str:
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_simhash_cte()}
SELECT doc_id, simhash FROM sim
"""


def simhash_neardup(max_hamming: int = 3, bands: int = 4, bits: int = 32) -> str:
    bw = bits // bands
    return f"""
WITH {_NEAR_COPY_CORPUS},
{_simhash_cte(bits)},
bs AS (
  SELECT doc_id, simhash, k, (simhash >> (k * {bw})) & {(1 << bw) - 1} AS bk
  FROM sim, LATERAL unnest(generate_series(0, {bands - 1})) AS t(k)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bs a JOIN bs b ON a.k = b.k AND a.bk = b.bk
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def embedding_neardup(threshold: float = 0.9) -> str:
    cos = duckdb_cosine_sql("ea", "eb")
    dbl = "list_transform(generate_series(1, len(embedding)), i -> CAST(embedding[i] AS DOUBLE))"
    pert = (
        "list_transform(generate_series(1, len(embedding)), "
        "i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.01 "
        "ELSE CAST(embedding[i] AS DOUBLE) END)"
    )
    return f"""
WITH vc AS (
  SELECT vec_id, label, {dbl} AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id, label, {pert} AS e
  FROM embeddings WHERE vec_id % 10 = 0
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
  FROM vc a JOIN vc b ON a.label = b.label AND a.vec_id < b.vec_id
),
scored AS (SELECT id_a, id_b, {cos} AS cos_sim FROM p)
SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
FROM scored WHERE cos_sim >= {threshold}
"""


def semdedup(n_centroids: int = 16, threshold: float = 0.97) -> str:
    """Oracle for operators/dedup.semdedup (SemDeDup, arXiv:2303.09540):
    same perturbed corpus as embedding_neardup, centroid j = vector with
    vec_id j, nearest-centroid argmax assignment (cosine DESC, cluster_id
    ASC tiebreak), min-id exemplar keeps inside each within-cluster
    near-set."""
    cosc = duckdb_cosine_sql("v.e", "c.ce")
    cosp = duckdb_cosine_sql("a.e", "b.e")
    dbl = "list_transform(generate_series(1, len(embedding)), i -> CAST(embedding[i] AS DOUBLE))"
    pert = (
        "list_transform(generate_series(1, len(embedding)), "
        "i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.01 "
        "ELSE CAST(embedding[i] AS DOUBLE) END)"
    )
    return f"""
WITH vc AS (
  SELECT vec_id, {dbl} AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id, {pert} AS e
  FROM embeddings WHERE vec_id % 10 = 0
),
cents AS (SELECT vec_id AS cluster_id, e AS ce FROM vc WHERE vec_id < {n_centroids}),
scoredc AS (
  SELECT v.vec_id, c.cluster_id, {cosc} AS cos_c, v.e
  FROM vc v CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, cluster_id, e FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, cluster_id ASC) AS rn
    FROM scoredc
  ) WHERE rn = 1
),
dom AS (
  SELECT b.vec_id, min(a.vec_id) AS dropped_for
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {cosp} >= {threshold}
  GROUP BY b.vec_id
)
SELECT s.vec_id, s.cluster_id,
       dom.dropped_for IS NULL AS is_kept,
       dom.dropped_for
FROM assigned s LEFT JOIN dom ON s.vec_id = dom.vec_id
"""


def repeated_spans(span_len: int = 60, stride: int = 30, min_occ: int = 2) -> str:
    """Oracle for operators/dedup.repeated_spans (Lee et al. 2021,
    arXiv:2107.06499): stride-windowed exact span counts over the
    near-copy corpus; per-doc duplicated-span fraction."""
    return f"""
WITH {_NEAR_COPY_CORPUS},
d AS (
  SELECT doc_id, text,
         CASE WHEN length(text) >= {span_len}
              THEN ((length(text) - {span_len}) // {stride})::INT + 1
              ELSE 0 END AS n_off
  FROM corpus
),
spans AS (
  SELECT doc_id, substr(text, (i - 1) * {stride} + 1, {span_len}) AS span
  FROM d, LATERAL unnest(generate_series(1, n_off)) AS t(i)
  WHERE n_off > 0
),
occ AS (SELECT span, count(*) AS n_occ FROM spans GROUP BY span),
per_doc AS (
  SELECT s.doc_id, count(*) AS n_spans,
         count(*) FILTER (WHERE o.n_occ >= {min_occ}) AS n_dup_spans
  FROM spans s JOIN occ o USING (span)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       coalesce(per_doc.n_spans, 0) AS n_spans,
       coalesce(per_doc.n_dup_spans, 0) AS n_dup_spans,
       CASE WHEN coalesce(per_doc.n_spans, 0) > 0
            THEN round(per_doc.n_dup_spans / per_doc.n_spans::DOUBLE, 6)
            ELSE 0.0 END AS dup_frac
FROM d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""


def dup_span_removal(
    span_len: int = 60, stride: int = 30, min_occ: int = 2
) -> str:
    """Oracle for operators/dedup.dup_span_removal (Lee et al. 2021 §4:
    remove every duplicated substring, keep one canonical occurrence):
    stride windows over the near-copy corpus, map-combinable canonical
    pick via the packed (doc_id << 31 | off) min key, gaps-and-islands
    merge of marked windows, trimmed text = ordered concat of kept
    segments + tail — mirrored token-for-token against the Spark
    window/island/segment chain."""
    last = span_len - 1
    return f"""
WITH {_NEAR_COPY_CORPUS},
d AS (
  SELECT doc_id, text,
         CASE WHEN length(text) >= {span_len}
              THEN ((length(text) - {span_len}) // {stride})::INT + 1
              ELSE 0 END AS n_off
  FROM corpus
),
wins AS (
  SELECT doc_id, CAST((i - 1) * {stride} + 1 AS BIGINT) AS off,
         substr(text, (i - 1) * {stride} + 1, {span_len}) AS span
  FROM d, LATERAL unnest(generate_series(1, n_off)) AS t(i)
  WHERE n_off > 0
),
occ AS (
  SELECT span, count(*) AS n_occ,
         min(doc_id * 2147483648 + off) AS canon_key
  FROM wins GROUP BY span
),
marked AS (
  SELECT w.doc_id, w.off AS s, w.off + {last} AS e
  FROM wins w JOIN occ USING (span)
  WHERE n_occ >= {min_occ}
    AND w.doc_id * 2147483648 + w.off <> canon_key
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM marked
),
numbered AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM flagged
),
islands AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM numbered GROUP BY doc_id, isl
),
segs AS (
  SELECT doc_id, s, e,
         lag(e) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
  FROM islands
),
agg AS (
  SELECT g.doc_id,
         CAST(count(*) AS INT) AS n_spans_removed,
         CAST(sum(g.e - g.s + 1) AS BIGINT) AS removed_chars,
         string_agg(
           substr(dd.text,
                  CAST(coalesce(g.prev_e + 1, 1) AS INT),
                  CAST(g.s - coalesce(g.prev_e + 1, 1) AS INT)),
           '' ORDER BY g.s) AS head_text,
         max(g.e) AS last_e
  FROM segs g JOIN d dd USING (doc_id)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(a.n_spans_removed, 0) AS n_spans_removed,
       coalesce(a.removed_chars, CAST(0 AS BIGINT)) AS removed_chars,
       CASE WHEN a.doc_id IS NULL THEN d.text
            ELSE coalesce(a.head_text, '')
                 || substr(d.text, CAST(a.last_e + 1 AS INT))
       END AS trimmed_text
FROM d LEFT JOIN agg a USING (doc_id)
"""


def ann_bruteforce_topk(query_ids: list[int], k: int = 5) -> str:
    cos = duckdb_cosine_sql("e.embedding", "q.embedding")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def ann_ivf_topk(
    query_ids: list[int], n_cells: int = 10, n_probe: int = 2, k: int = 5
) -> str:
    dot_ec = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    dot_qc = (
        "list_sum(list_transform(generate_series(1, len(q.embedding)), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    cos = duckdb_cosine_sql("a.emb", "qc.qemb")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < {n_cells}),
ass AS (
  SELECT vec_id, emb, cell_id FROM (
    SELECT e.vec_id, e.embedding AS emb, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.cell_id ASC) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
),
qc AS (
  SELECT query_id, qemb, cell_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qemb, c.cell_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {dot_qc} DESC, c.cell_id ASC) AS r
    FROM embeddings q CROSS JOIN cents c
    WHERE q.vec_id IN ({ids})
  ) WHERE r <= {n_probe}
),
scored AS (
  SELECT qc.query_id, a.vec_id, {cos} AS score
  FROM ass a JOIN qc ON a.cell_id = qc.cell_id
  WHERE a.vec_id <> qc.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def ann_pq_topk(
    query_ids: list[int],
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    oversample: int = 3,
) -> str:
    """PQ/ADC ANN with exact rescore (operators/ann.pq_topk). Replays the
    deterministic pipeline: vec_id<n_codes codebook → per-subspace L2
    argmin codes ((d, code_id)-min) → query LUT of subvector·code dots →
    m-ORDERED ADC sum (list built ORDER BY m — the float-order
    discipline) → k·oversample candidates → full-precision cosine
    rescore."""
    s = dim // m
    ids = ", ".join(str(i) for i in query_ids)
    l2 = (
        f"list_sum(list_transform(generate_series(1, {s}), i -> "
        f"(CAST(e.embedding[sub.m * {s} + i] AS DOUBLE) - cb.sub[i]) * "
        f"(CAST(e.embedding[sub.m * {s} + i] AS DOUBLE) - cb.sub[i])))"
    )
    qdot = (
        f"list_sum(list_transform(generate_series(1, {s}), i -> "
        f"CAST(q.embedding[sub.m * {s} + i] AS DOUBLE) * cb.sub[i]))"
    )
    rcos = duckdb_cosine_sql("e.embedding", "q.embedding")
    return f"""
WITH ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m),
cb AS MATERIALIZED (
  SELECT ms.m, c.vec_id AS code_id,
         list_transform(generate_series(1, {s}),
           i -> CAST(c.embedding[ms.m * {s} + i] AS DOUBLE)) AS sub
  FROM embeddings c, ms WHERE c.vec_id < {n_codes}
),
dists AS (
  SELECT e.vec_id, sub.m, cb.code_id, {l2} AS d
  FROM embeddings e, ms sub
  JOIN cb ON cb.m = sub.m
),
codes AS MATERIALIZED (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d ASC, code_id ASC) AS r
    FROM dists
  ) WHERE r = 1
),
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, sub.m, cb.code_id, {qdot} AS pd
  FROM embeddings q, ms sub
  JOIN cb ON cb.m = sub.m
  WHERE q.vec_id IN ({ids})
),
adot AS (
  SELECT l.query_id, c.vec_id,
         list_sum(list(l.pd ORDER BY c.m)) AS ascore
  FROM codes c JOIN lut l ON l.m = c.m AND l.code_id = c.code_id
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ascore DESC, vec_id ASC) AS r
    FROM adot
  ) WHERE r <= {k * oversample}
),
rescored AS (
  SELECT c.query_id, c.vec_id, {rcos} AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rnk
  FROM rescored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def ann_ivf_pq_topk(
    query_ids: list[int],
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    n_cells: int = 10,
    n_probe: int = 2,
    k: int = 5,
    oversample: int = 3,
) -> str:
    """IVF-PQ (operators/ann.ivf_pq_topk): the ann_ivf cell-probe
    composed with the ann_pq ADC pipeline — candidates restricted to the
    probed (query, cell) pairs before the ordered ADC sum, then the
    shared exact-rescore funnel."""
    s = dim // m
    ids = ", ".join(str(i) for i in query_ids)
    dot_ec = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    dot_qc = (
        "list_sum(list_transform(generate_series(1, len(q.embedding)), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    l2 = (
        f"list_sum(list_transform(generate_series(1, {s}), i -> "
        f"(CAST(e.embedding[sub.m * {s} + i] AS DOUBLE) - cb.sub[i]) * "
        f"(CAST(e.embedding[sub.m * {s} + i] AS DOUBLE) - cb.sub[i])))"
    )
    qdot = (
        f"list_sum(list_transform(generate_series(1, {s}), i -> "
        f"CAST(q.embedding[sub.m * {s} + i] AS DOUBLE) * cb.sub[i]))"
    )
    rcos = duckdb_cosine_sql("e.embedding", "q.embedding")
    return f"""
WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < {n_cells}),
ass AS MATERIALIZED (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.cell_id ASC) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
),
qc AS (
  SELECT query_id, cell_id FROM (
    SELECT q.vec_id AS query_id, c.cell_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {dot_qc} DESC, c.cell_id ASC) AS r
    FROM embeddings q CROSS JOIN cents c
    WHERE q.vec_id IN ({ids})
  ) WHERE r <= {n_probe}
),
probed AS MATERIALIZED (
  SELECT qc.query_id, a.vec_id FROM ass a JOIN qc USING (cell_id)
),
ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m),
cb AS MATERIALIZED (
  SELECT ms.m, c.vec_id AS code_id,
         list_transform(generate_series(1, {s}),
           i -> CAST(c.embedding[ms.m * {s} + i] AS DOUBLE)) AS sub
  FROM embeddings c, ms WHERE c.vec_id < {n_codes}
),
dists AS (
  SELECT e.vec_id, sub.m, cb.code_id, {l2} AS d
  FROM embeddings e, ms sub
  JOIN cb ON cb.m = sub.m
),
codes AS MATERIALIZED (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d ASC, code_id ASC) AS r
    FROM dists
  ) WHERE r = 1
),
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, sub.m, cb.code_id, {qdot} AS pd
  FROM embeddings q, ms sub
  JOIN cb ON cb.m = sub.m
  WHERE q.vec_id IN ({ids})
),
adot AS (
  SELECT l.query_id, c.vec_id,
         list_sum(list(l.pd ORDER BY c.m)) AS ascore
  FROM codes c
  JOIN lut l ON l.m = c.m AND l.code_id = c.code_id
  SEMI JOIN probed p ON p.query_id = l.query_id AND p.vec_id = c.vec_id
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ascore DESC, vec_id ASC) AS r
    FROM adot
  ) WHERE r <= {k * oversample}
),
rescored AS (
  SELECT cn.query_id, cn.vec_id, {rcos} AS score
  FROM cand cn
  JOIN embeddings e ON e.vec_id = cn.vec_id
  JOIN embeddings q ON q.vec_id = cn.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rnk
  FROM rescored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def ann_srp_topk(
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 16,
    bits_per_band: int = 4,
    dim: int = 64,
) -> str:
    """Deterministic SRP-LSH (operators/ann.srp_topk): the SAME md5-derived
    Rademacher plane matrix is inlined as literals here, so bucket keys —
    and therefore the approximate candidate set — are identical to Spark's."""
    from .operators.ann import srp_planes

    planes = srp_planes(n_planes, dim)
    bit_cols = []
    for p, row in enumerate(planes):
        lits = ", ".join(str(v) for v in row)
        proj = (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ([{lits}])[i]))"
        )
        bit_cols.append(f"CASE WHEN {proj} >= 0 THEN 1 ELSE 0 END AS b{p}")
    n_bands = n_planes // bits_per_band
    band_selects = []
    for b in range(n_bands):
        key = " + ".join(
            f"b{b * bits_per_band + i} * {1 << i}" for i in range(bits_per_band)
        )
        band_selects.append(
            f"SELECT vec_id, {b} AS band, CAST({key} AS INT) AS key FROM sig"
        )
    bands_sql = "\n  UNION ALL ".join(band_selects)
    ids = ", ".join(str(i) for i in query_ids)
    cos = duckdb_cosine_sql("e.embedding", "q.embedding")
    return f"""
WITH sig AS MATERIALIZED (
  SELECT vec_id, {", ".join(bit_cols)} FROM embeddings
),
bands AS MATERIALIZED (
  {bands_sql}
),
qb AS (SELECT vec_id AS query_id, band, key FROM bands WHERE vec_id IN ({ids})),
cand AS (
  SELECT DISTINCT qb.query_id, b.vec_id
  FROM bands b JOIN qb ON b.band = qb.band AND b.key = qb.key
  WHERE b.vec_id <> qb.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id, {cos} AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def ann_sq_topk(query_ids: list[int], k: int = 5, oversample: int = 3) -> str:
    """int8 scalar-quantized ANN with exact rescore (operators/ann.sq_topk).
    Replays the full deterministic pipeline: global component bounds →
    round-to-nearest int8 codes → cosine over the RECONSTRUCTED vectors
    ranks k*oversample candidates → full-precision cosine rescores only
    those → top-k. Every arithmetic step is written in the same literal
    order as the Spark column expressions (quantize:
    (x-mn)*255/dn + 0.5; dequant: mn + (v+128)*dn/255), so doubles —
    and therefore candidate sets — are bit-identical across engines."""
    ids = ", ".join(str(i) for i in query_ids)
    code = (
        "list_transform(e.embedding, x -> CAST(floor("
        "(CAST(x AS DOUBLE) - bb.mn) * 255.0 / bb.dn + 0.5) - 128 AS TINYINT))"
    )
    dequant = (
        "list_transform(code, v -> mn + (CAST(v AS DOUBLE) + 128.0) * dn / 255.0)"
    )
    acos = duckdb_cosine_sql("d.dq", "qd.dq")
    rcos = duckdb_cosine_sql("e.embedding", "q.embedding")
    return f"""
WITH b AS (
  SELECT CAST(min(list_min(embedding)) AS DOUBLE) AS mn,
         CAST(max(list_max(embedding)) AS DOUBLE) AS mx
  FROM embeddings
),
bb AS (SELECT mn, mx, CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END AS dn FROM b),
coded AS MATERIALIZED (
  SELECT e.vec_id, bb.mn, bb.dn, {code} AS code
  FROM embeddings e CROSS JOIN bb
),
dq AS MATERIALIZED (
  SELECT vec_id, {dequant} AS dq FROM coded
),
approx AS (
  SELECT qd.vec_id AS query_id, d.vec_id, {acos} AS ascore
  FROM dq d CROSS JOIN (SELECT vec_id, dq FROM dq WHERE vec_id IN ({ids})) qd
  WHERE d.vec_id <> qd.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ascore DESC, vec_id ASC) AS r
    FROM approx
  ) WHERE r <= {k * oversample}
),
rescored AS (
  SELECT c.query_id, c.vec_id, {rcos} AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM rescored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


_COOC_EDGES = """
ed AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         count(DISTINCT a.l_orderkey) AS weight
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
gn AS MATERIALIZED (SELECT DISTINCT node_id FROM (SELECT src AS node_id FROM ed UNION ALL SELECT dst FROM ed))
"""


def graph_degree_stats() -> str:
    return f"""
WITH {_COOC_EDGES},
od AS (SELECT src AS node_id, count(*) AS out_deg, CAST(sum(weight) AS BIGINT) AS w_out FROM ed GROUP BY src),
idg AS (SELECT dst AS node_id, count(*) AS in_deg, CAST(sum(weight) AS BIGINT) AS w_in FROM ed GROUP BY dst)
SELECT gn.node_id,
       coalesce(od.out_deg, 0) AS out_deg,
       coalesce(idg.in_deg, 0) AS in_deg,
       -- CAST: avoid DuckDB HUGEINT widening (Spark side is BIGINT)
       CAST(coalesce(od.w_out, 0) + coalesce(idg.w_in, 0) AS BIGINT) AS total_weight
FROM gn LEFT JOIN od USING (node_id) LEFT JOIN idg USING (node_id)
"""


def graph_k_hop(seed: int, max_hops: int = 2, reverse: bool = False) -> str:
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    return f"""
WITH RECURSIVE {_COOC_EDGES},
reach(node, depth) AS (
  SELECT {seed}, 0
  UNION ALL
  SELECT e.{dst}, r.depth + 1
  FROM reach r JOIN ed e ON e.{src} = r.node
  WHERE r.depth < {max_hops}
)
SELECT node AS node_id, min(depth) AS depth
FROM reach WHERE node <> {seed} GROUP BY node
"""


def graph_batch_impact(seed_mod: int = 10, seed_cap: int = 2000, max_hops: int = 2) -> str:
    """G3 impact analysis batched over every seed ≡0 (mod seed_mod) below
    seed_cap — one frontier expansion carries all seeds (per-seed
    amortization of the Spark job floor)."""
    return f"""
WITH RECURSIVE {_COOC_EDGES},
seeds AS (SELECT node_id AS seed FROM gn
          WHERE node_id % {seed_mod} = 0 AND node_id < {seed_cap}),
reach(seed, node, depth) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION ALL
  SELECT r.seed, e.src, r.depth + 1
  FROM reach r JOIN ed e ON e.dst = r.node
  WHERE r.depth < {max_hops}
)
SELECT seed, node AS node_id, min(depth) AS depth
FROM reach WHERE node <> seed GROUP BY seed, node
"""


def graph_batch_2hop(seed_mod: int = 10, seed_cap: int = 2000, max_hops: int = 2) -> str:
    """G1 forward k-hop batched over the same seed set as the batch impact
    query — the outgoing-edge twin (per-seed amortization for the 2-hop
    <10 ms budget)."""
    return f"""
WITH RECURSIVE {_COOC_EDGES},
seeds AS (SELECT node_id AS seed FROM gn
          WHERE node_id % {seed_mod} = 0 AND node_id < {seed_cap}),
reach(seed, node, depth) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION ALL
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r JOIN ed e ON e.src = r.node
  WHERE r.depth < {max_hops}
)
SELECT seed, node AS node_id, min(depth) AS depth
FROM reach WHERE node <> seed GROUP BY seed, node
"""


def graph_pagerank(n_iters: int = 10, damping: float = 0.85) -> str:
    parts = [
        f"WITH {_COOC_EDGES},",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM gn),",
        "odeg AS (SELECT gn.node_id, coalesce(o.c, 0) AS out_deg FROM gn "
        "LEFT JOIN (SELECT src AS node_id, count(*) AS c FROM ed GROUP BY src) o "
        "USING (node_id)),",
        "pr0 AS MATERIALIZED (SELECT node_id, out_deg, 1.0 / nn.n AS rank FROM odeg CROSS JOIN nn)",
    ]
    for i in range(n_iters):
        parts.append(
            f""",
dg{i} AS (SELECT coalesce(sum(rank), 0.0) AS dang FROM pr{i} WHERE out_deg = 0),
cb{i} AS (
  SELECT e.dst AS node_id, sum(p.rank / p.out_deg) AS inflow
  FROM ed e JOIN pr{i} p ON p.node_id = e.src GROUP BY e.dst
),
pr{i + 1} AS MATERIALIZED (
  SELECT p.node_id, p.out_deg,
         (1.0 - {damping}) / nn.n
           + {damping} * (coalesce(c.inflow, 0.0) + dg{i}.dang / nn.n) AS rank
  FROM pr{i} p LEFT JOIN cb{i} c USING (node_id) CROSS JOIN nn CROSS JOIN dg{i}
)"""
        )
    parts.append(
        f"\nSELECT node_id, round(rank, 6) AS rank FROM pr{n_iters}"
    )
    return "".join(parts)


def graph_ppr(
    seeds: list[int], n_iters: int = 10, damping: float = 0.85
) -> str:
    """Personalized PageRank (graph.personalized_pagerank): the
    graph_pagerank unroll with the teleport CASE concentrated on the
    seed set; dangling mass returns to the seeds."""
    p_seed = 1.0 / len(seeds)
    ids = ", ".join(str(s) for s in seeds)
    pcol = f"CASE WHEN node_id IN ({ids}) THEN {p_seed} ELSE 0.0 END"
    parts = [
        f"WITH {_COOC_EDGES},",
        "odeg AS (SELECT gn.node_id, coalesce(o.c, 0) AS out_deg FROM gn "
        "LEFT JOIN (SELECT src AS node_id, count(*) AS c FROM ed GROUP BY src) o "
        "USING (node_id)),",
        f"pr0 AS MATERIALIZED (SELECT node_id, out_deg, {pcol} AS rank FROM odeg)",
    ]
    for i in range(n_iters):
        parts.append(
            f""",
dg{i} AS (SELECT coalesce(sum(rank), 0.0) AS dang FROM pr{i} WHERE out_deg = 0),
cb{i} AS (
  SELECT e.dst AS node_id, sum(p.rank / p.out_deg) AS inflow
  FROM ed e JOIN pr{i} p ON p.node_id = e.src GROUP BY e.dst
),
pr{i + 1} AS MATERIALIZED (
  SELECT p.node_id, p.out_deg,
         (1.0 - {damping}) * ({pcol})
           + {damping} * (coalesce(c.inflow, 0.0)
                          + dg{i}.dang * ({pcol})) AS rank
  FROM pr{i} p LEFT JOIN cb{i} c USING (node_id) CROSS JOIN dg{i}
)"""
        )
    parts.append(
        f"\nSELECT node_id, round(rank, 6) AS rank FROM pr{n_iters}"
    )
    return "".join(parts)


def graph_connected_components(n_iters: int = 15) -> str:
    parts = [
        f"WITH {_COOC_EDGES},",
        "und AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),",
        "l0 AS MATERIALIZED (SELECT node_id, node_id AS component FROM gn)",
    ]
    for i in range(n_iters):
        parts.append(
            f""",
m{i} AS (
  SELECT u.dst AS node_id, min(l.component) AS nbr
  FROM und u JOIN l{i} l ON l.node_id = u.src GROUP BY u.dst
),
l{i + 1} AS MATERIALIZED (
  SELECT l.node_id, least(l.component, coalesce(m.nbr, l.component)) AS component
  FROM l{i} l LEFT JOIN m{i} m USING (node_id)
)"""
        )
    parts.append(f"\nSELECT node_id, component FROM l{n_iters}")
    return "".join(parts)


def corpus_report() -> str:
    """Oracle for the corpus data-card report: per-source aggregates over
    the SAME lang_id and quality_score pipelines (nested verbatim as
    subqueries — one definition, reused), so the report's inputs are the
    already-hash-verified per-doc signals. Float columns are averaged in
    exact integer microunits (functions/emit.py) mirroring the Spark
    side: per-doc quality → microunit BIGINT, exact integer sums, one
    IEEE division — bit-identical across engines."""
    mq = micro6_sql(
        "CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT)) AS DOUBLE)"
        " / (count(*) * 1000000.0)"
    )
    mt = micro6_sql("CAST(sum(q.n_tokens) AS DOUBLE) / count(*)")
    lm = micro6_sql(
        "CAST(sum(CASE WHEN lp.lang_pred = d.lang THEN 1 ELSE 0 END)"
        " AS DOUBLE) / count(*)"
    )
    return f"""
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       {mq} AS mean_quality,
       {mt} AS mean_tokens,
       {lm} AS lang_match_frac
FROM documents d
JOIN ({lang_id()}) lp ON lp.doc_id = d.doc_id
JOIN ({quality_score()}) q ON q.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


def token_count() -> str:
    """Token counting: whitespace + BPE-ish regex passes."""
    from .operators.textstats import duckdb_token_counts_sql

    return duckdb_token_counts_sql()


def sequence_packing(budget: int = 512) -> str:
    """Training-data sequence packing: the sequential first-fit walk as a
    per-source recursive CTE (the SQL twin of operators/packing.py)."""
    from .operators.textstats import BPE_TOKEN_RE

    return f"""
WITH RECURSIVE tok AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INT)
           AS tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
walk AS (
  SELECT source, doc_id, rn, tokens, 0 AS bin_id, tokens AS bin_fill
  FROM tok WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.rn, t.tokens,
         CASE WHEN w.bin_fill + t.tokens > {budget}
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.bin_fill + t.tokens > {budget}
              THEN t.tokens ELSE w.bin_fill + t.tokens END
  FROM walk w JOIN tok t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT source, doc_id, tokens,
       CAST(bin_id AS INT) AS bin_id, CAST(bin_fill AS INT) AS bin_fill
FROM walk
"""


def doc_extraction() -> str:
    """S3 extraction: format dispatch + digest-fake pdf/epub extraction,
    plain text passthrough (sources/extraction.py)."""
    return """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'pdf' WHEN 1 THEN 'epub'
            ELSE 'text' END AS format,
       CASE doc_id % 3
         WHEN 0 THEN 'pdf:' || md5('%PDF-1.4' || chr(10) || text)
         WHEN 1 THEN 'epub:' || md5('PK' || chr(3) || chr(4) || text)
         ELSE text END AS text,
       CAST(length(CASE doc_id % 3
         WHEN 0 THEN 'pdf:' || md5('%PDF-1.4' || chr(10) || text)
         WHEN 1 THEN 'epub:' || md5('PK' || chr(3) || chr(4) || text)
         ELSE text END) AS INT) AS n_chars
FROM documents
"""


def splade_search(query_terms: list[str], k: int = 20) -> str:
    """R6 SPLADE-contract sparse search: expansion postings for docs and
    query (identical encoder), dot product via posting equi-join, top-k."""
    from .functions.embedder import duckdb_splade_postings_sql

    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH {_tf_df_ctes()},
{duckdb_splade_postings_sql("tf", "dsp")},
qtok AS (SELECT unnest([{terms}]) AS term),
qtf AS (SELECT 0 AS doc_id, term, count(*) AS tf FROM qtok GROUP BY term),
{duckdb_splade_postings_sql("qtf", "qsp")}
SELECT d.doc_id, round(sum(d.weight * q.weight), 6) AS score
FROM dsp_post d JOIN qsp_post q USING (term_id)
GROUP BY d.doc_id
ORDER BY score DESC, d.doc_id ASC LIMIT {k}
"""


def semantic_chunks(max_chars: int, overlap: int) -> str:
    """S3 semantic chunking over the synthetic multi-unit python corpus
    (module preamble + def alpha + even-doc class Beta + def gamma)."""
    from .sources.code_chunker import duckdb_semantic_chunk_sql

    return f"""
WITH scf AS (
  SELECT source AS tenant_id,
         'm' || CAST(doc_id AS VARCHAR) || '.py' AS file_path,
         '# module doc ' || CAST(doc_id AS VARCHAR) || chr(10)
         || 'def alpha' || CAST(doc_id AS VARCHAR) || '():' || chr(10)
         || '    ' || substr(text, 1, 150) || chr(10)
         || CASE WHEN doc_id % 2 = 0
                 THEN 'class Beta' || CAST(doc_id AS VARCHAR) || ':' || chr(10)
                      || '    ' || substr(text, 151, 150) || chr(10)
                 ELSE '' END
         || 'def gamma' || CAST(doc_id AS VARCHAR) || '():' || chr(10)
         || '    ' || substr(text, 301, 100) AS content
  FROM documents
),
{duckdb_semantic_chunk_sql("scf", "python", max_chars, overlap)}
SELECT * FROM sem_chunks
"""


def nested_chunks(max_chars: int, overlap: int) -> str:
    """S3 nested chunking over the synthetic nested-definition corpus
    (Outer class > method + Inner class > method, then a top-level def)."""
    from .sources.code_chunker import duckdb_semantic_chunk_sql

    return f"""
WITH ncf AS (
  SELECT source AS tenant_id,
         'n' || CAST(doc_id AS VARCHAR) || '.py' AS file_path,
         '# module doc ' || CAST(doc_id AS VARCHAR) || chr(10)
         || 'class Outer' || CAST(doc_id AS VARCHAR) || ':' || chr(10)
         || '    def m' || CAST(doc_id AS VARCHAR) || '(self):' || chr(10)
         || '        ' || substr(text, 1, 120) || chr(10)
         || '    class Inner' || CAST(doc_id AS VARCHAR) || ':' || chr(10)
         || '        def deep' || CAST(doc_id AS VARCHAR) || '(self):' || chr(10)
         || '            ' || substr(text, 121, 120) || chr(10)
         || 'def top' || CAST(doc_id AS VARCHAR) || '():' || chr(10)
         || '    ' || substr(text, 241, 100) AS content
  FROM documents
),
{duckdb_semantic_chunk_sql("ncf", "python", max_chars, overlap, nested=True)}
SELECT * FROM sem_chunks
"""


def nested_chunks_brace(max_chars: int, overlap: int) -> str:
    """S3/G11 brace-mode nested chunking over the synthetic JS corpus
    (outer function > inner function, then a top-level class); depth is
    the running {}-balance, mirroring semantic_chunk(nest_mode='brace')."""
    from .sources.code_chunker import duckdb_semantic_chunk_sql

    return f"""
WITH nbf AS (
  SELECT source AS tenant_id,
         'b' || CAST(doc_id AS VARCHAR) || '.js' AS file_path,
         '// module doc ' || CAST(doc_id AS VARCHAR) || chr(10)
         || 'function outer' || CAST(doc_id AS VARCHAR) || '() {{' || chr(10)
         || '  const a' || CAST(doc_id AS VARCHAR) || ' = '
           || substr(replace(replace(text, '{{', ''), '}}', ''), 1, 120) || chr(10)
         || '  function inner' || CAST(doc_id AS VARCHAR) || '() {{' || chr(10)
         || '    const b' || CAST(doc_id AS VARCHAR) || ' = '
           || substr(replace(replace(text, '{{', ''), '}}', ''), 121, 120) || chr(10)
         || '  }}' || chr(10)
         || '}}' || chr(10)
         || 'class Top' || CAST(doc_id AS VARCHAR) || ' {{' || chr(10)
         || '  c' || CAST(doc_id AS VARCHAR) || ' = '
           || substr(replace(replace(text, '{{', ''), '}}', ''), 241, 100) || chr(10)
         || '}}' AS content
  FROM documents
),
{duckdb_semantic_chunk_sql("nbf", "javascript", max_chars, overlap, nested=True, nest_mode="brace")}
SELECT * FROM sem_chunks
"""


def _affinity_cc_sql(n_iters: int = 8) -> str:
    """Min-label connected-components closure over a `pairs(id_a, id_b)`
    CTE (tag_affinity.rs:104-150's BFS, as fixed-sweep label propagation —
    sweeps past the fixed point are no-ops). Yields cc{n}(node, label)."""
    parts = [
        """
und AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
cc0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM und)"""
    ]
    for i in range(n_iters):
        parts.append(
            f""",
nm{i} AS (
  SELECT u.u AS node, min(l.label) AS nbr
  FROM und u JOIN cc{i} l ON l.node = u.v GROUP BY u.u
),
cc{i + 1} AS MATERIALIZED (
  SELECT l.node, least(l.label, coalesce(m.nbr, l.label)) AS label
  FROM cc{i} l LEFT JOIN nm{i} m USING (node)
)"""
        )
    return "".join(parts)


_TAG_PROFILE_CTE = """
tp AS MATERIALIZED (
  SELECT DISTINCT source AS tenant_id,
         lang || ':' || CAST(floor(n_chars / 100.0) AS INT) AS tag
  FROM documents
),
ts AS (SELECT tenant_id, count(*) AS n FROM tp GROUP BY tenant_id)
"""


def grouping_tag_affinity(threshold: float, n_iters: int = 8) -> str:
    """A14 tag-affinity grouping (tag_affinity.rs:78-150): per-tenant
    DISTINCT tag profiles, pairwise Jaccard >= threshold, connected
    components; group_key = min member tenant."""
    return f"""
WITH {_TAG_PROFILE_CTE},
inter AS (
  SELECT a.tenant_id AS id_a, b.tenant_id AS id_b, count(*) AS i
  FROM tp a JOIN tp b USING (tag)
  WHERE a.tenant_id < b.tenant_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b
  FROM inter
  JOIN ts sa ON sa.tenant_id = inter.id_a
  JOIN ts sb ON sb.tenant_id = inter.id_b
  WHERE i * 1.0 / (sa.n + sb.n - i) >= {threshold}
),
{_affinity_cc_sql(n_iters)}
SELECT node AS tenant_id, label AS group_key FROM cc{n_iters}
"""


def grouping_embedding_affinity(threshold: float, n_iters: int = 8) -> str:
    """A14 embedding-affinity grouping (affinity/computation.rs:17-43 +
    aggregation.rs:12-21): per-tenant uniform-mean embedding, pairwise
    cosine rounded to 6 then thresholded (so the boundary compare is
    identical across engines), connected components."""
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc.source AS tenant_id, g.i AS pos, v.embedding[g.i] AS x
  FROM embeddings v
  JOIN documents doc ON doc.doc_id = v.vec_id,
  LATERAL (SELECT unnest(generate_series(1, len(v.embedding))) AS i) g
),
m AS MATERIALIZED (SELECT tenant_id, pos, avg(x) AS val FROM d GROUP BY 1, 2),
nrm AS (SELECT tenant_id, sqrt(sum(val * val)) AS nrm FROM m GROUP BY 1),
dots AS (
  SELECT a.tenant_id AS id_a, b.tenant_id AS id_b, sum(a.val * b.val) AS dot
  FROM m a JOIN m b USING (pos)
  WHERE a.tenant_id < b.tenant_id GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b
  FROM dots
  JOIN nrm na ON na.tenant_id = dots.id_a
  JOIN nrm nb ON nb.tenant_id = dots.id_b
  WHERE round(dot / (na.nrm * nb.nrm), 6) >= {threshold}
),
{_affinity_cc_sql(n_iters)}
SELECT node AS tenant_id, label AS group_key FROM cc{n_iters}
"""


def grouping_structural() -> str:
    """A14 workspace + git-org strategies over synthetic project registry
    rows derived from tenant index n = int(source[3:]):
      n%4==0 https scheme w/ .git  -> github.com/orgalpha
      n%4==1 scp-style gitlab      -> gitlab.com/org-beta
      n%4==2 ssh scheme, trailing / -> bitbucket.org/teamgamma
      n%4==3 no org component       -> ungrouped
      n%2==0 workspace root /ws/root{{n%3}}, else standalone."""
    return """
WITH t AS (
  SELECT DISTINCT source AS tenant_id,
         CAST(substr(source, 4) AS INT) AS n
  FROM documents
),
git AS (
  SELECT tenant_id,
         CASE n % 4
           WHEN 0 THEN 'git_org:github.com/orgalpha'
           WHEN 1 THEN 'git_org:gitlab.com/org-beta'
           WHEN 2 THEN 'git_org:bitbucket.org/teamgamma'
         END AS group_key
  FROM t
),
ws AS (
  SELECT tenant_id,
         CASE WHEN n % 2 = 0
              THEN 'workspace:/ws/root' || CAST(n % 3 AS VARCHAR) END AS group_key
  FROM t
)
SELECT tenant_id, group_key, 'git_org' AS group_type
FROM git WHERE group_key IS NOT NULL
UNION ALL
SELECT tenant_id, group_key, 'workspace' FROM ws WHERE group_key IS NOT NULL
ORDER BY group_type, tenant_id
"""


# store.build_chunks metadata derivation, column for column (shared by
# the predicate-stack and scroll/retrieve oracles)
CHUNK_META_SQL = """
meta AS (
  SELECT c.doc_id, c.chunk_index,
         d.source AS tenant_id,
         CASE WHEN c.doc_id % 17 = 0 THEN 'libraries'
              WHEN c.doc_id % 23 = 0 THEN 'rules'
              WHEN c.doc_id % 29 = 0 THEN 'scratchpad'
              ELSE 'projects' END AS collection,
         CASE WHEN c.doc_id % 11 = 0 THEN ['main', 'dev']
              ELSE ['main'] END AS branches,
         'src/' || d.source || '/doc_' || CAST(c.doc_id AS VARCHAR) || '.txt'
           AS relative_path,
         CASE WHEN c.doc_id % 2 = 0 THEN 'code' ELSE 'text' END AS file_type,
         [d.lang, 'len_' || CAST(floor(d.n_chars / 100.0) AS INT)] AS tags,
         CASE WHEN c.doc_id % 5 = 0 THEN ['hot']
              ELSE CAST([] AS VARCHAR[]) END AS concept_tags,
         'comp.' || CAST(c.doc_id % 7 AS VARCHAR) AS component_id,
         CASE WHEN c.doc_id % 17 = 0 AND c.doc_id % 51 = 0 THEN true
              END AS deleted
  FROM chunks c JOIN documents d USING (doc_id)
)
"""


def scroll_retrieve(tenants: tuple[str, ...], limit: int, offset: int) -> str:
    """S9 scroll/retrieve (retrieve.rs): filtered scan, deterministic
    (point_id, collection) order, offset/limit page, metadata projection."""
    tenant_in = ", ".join(f"'{t}'" for t in tenants)
    return f"""
WITH {duckdb_chunk_text_sql()},
{CHUNK_META_SQL},
pts AS (
  SELECT md5(tenant_id || '|' || relative_path || '|'
             || CAST(chunk_index AS VARCHAR)) AS point_id,
         collection, tenant_id, relative_path,
         CAST(chunk_index AS INT) AS chunk_index, doc_id
  FROM meta
  WHERE tenant_id IN ({tenant_in})
    AND list_contains(branches, 'main')
    AND NOT coalesce(deleted, false)
),
paged AS (
  SELECT *, row_number() OVER (ORDER BY point_id, collection) AS rn FROM pts
)
SELECT point_id, collection, tenant_id, relative_path, chunk_index, doc_id
FROM paged WHERE rn > {offset} AND rn <= {offset + limit}
"""


def scroll_keyset(tenants: tuple[str, ...], page_limit: int, n_pages: int) -> str:
    """S9 keyset paging: the OFFSET formulation of the first n_pages
    keyset pages — one row_number window, page_idx = (rn-1) // limit.
    Hash-matching the Spark union of chained retrieve_after pages
    certifies the keyset and offset arms page-boundary-identical."""
    tenant_in = ", ".join(f"'{t}'" for t in tenants)
    return f"""
WITH {duckdb_chunk_text_sql()},
{CHUNK_META_SQL},
pts AS (
  SELECT md5(tenant_id || '|' || relative_path || '|'
             || CAST(chunk_index AS VARCHAR)) AS point_id,
         collection, tenant_id, relative_path,
         CAST(chunk_index AS INT) AS chunk_index, doc_id
  FROM meta
  WHERE tenant_id IN ({tenant_in})
    AND list_contains(branches, 'main')
    AND NOT coalesce(deleted, false)
),
paged AS (
  SELECT *, row_number() OVER (ORDER BY point_id, collection) AS rn FROM pts
)
SELECT point_id, collection, tenant_id, relative_path, chunk_index, doc_id,
       CAST((rn - 1) // {page_limit} AS INT) AS page_idx
FROM paged WHERE rn <= {page_limit * n_pages}
"""


def ocr_extraction(n_docs: int, prefix_chars: int) -> str:
    """S3 OCR round trip: the decoded text must equal the charset-
    normalized source prefix (upper -> keep [A-Z0-9 .,:-] -> rtrim) —
    the same normalization the Spark side renders through
    render_text_png and recognizes back with the matrix engine."""
    norm = (
        f"rtrim(regexp_replace(upper(substr(text, 1, {prefix_chars})), "
        f"'[^A-Z0-9 .,:-]', '', 'g'))"
    )
    return f"""
SELECT doc_id,
       'image' AS format,
       {norm} AS decoded,
       CAST(length({norm}) AS BIGINT) AS n_chars
FROM documents WHERE doc_id < {n_docs}
"""


def video_frame_features(n_assets: int) -> str:
    """S5 real AVI decode: closed-form recomputation of the decoder's
    feature vector for synthetic solid-frame clips — asset a has
    4+(a%4) frames of gray 51*((2a+k)%6) at 5+(a%3) fps; a solid frame
    of byte v has luma exactly v/255, so every statistic is an exact
    SQL aggregate over the frame-index range."""
    return f"""
WITH a AS (
  SELECT CAST(x AS BIGINT) AS asset_id,
         4 + (x % 4) AS nf, 5 + (x % 3) AS fps
  FROM range(0, {n_assets}) t(x)
),
fr AS (
  SELECT a.asset_id, a.nf, a.fps, k.x AS k,
         (51 * ((2 * a.asset_id + k.x) % 6)) / 255.0 AS luma
  FROM a JOIN range(0, 7) k(x) ON k.x < a.nf
),
mo AS (
  SELECT f1.asset_id, avg(abs(f2.luma - f1.luma)) AS motion
  FROM fr f1 JOIN fr f2
    ON f2.asset_id = f1.asset_id AND f2.k = f1.k + 1
  GROUP BY f1.asset_id
),
st AS (
  -- the AVI container stores dwMicroSecPerFrame = floor(1e6 / fps), so
  -- the DECODED fps is 1e6 / floor(1e6/fps), not the nominal fps —
  -- model the same quantization the writer/decoder pair performs
  SELECT asset_id,
         CAST(any_value(nf) AS DOUBLE)
           * (1000000 // any_value(fps)) / 1000000.0 AS duration_s,
         (1000000.0 / (1000000 // any_value(fps))) / 60.0 AS fps_n,
         CAST(any_value(nf) AS DOUBLE) AS n_frames,
         avg(luma) AS mean_luma,
         stddev_pop(luma) AS std_luma,
         max(luma) AS max_luma
  FROM fr GROUP BY asset_id
)
SELECT st.asset_id, st.duration_s, st.fps_n, st.n_frames, st.mean_luma,
       mo.motion, st.std_luma, st.max_luma
FROM st JOIN mo USING (asset_id)
"""


def orphan_nodes(min_weight: int = 2) -> str:
    """A2 orphan nodes (metrics.rs:342-356): part universe anti-joined
    against the endpoints of the weight-thresholded co-occurrence graph."""
    return f"""
WITH {_COOC_EDGES},
e2 AS (SELECT src, dst FROM ed WHERE weight >= {min_weight}),
ep AS (SELECT src AS node_id FROM e2 UNION SELECT dst FROM e2)
SELECT p.p_partkey AS node_id
FROM part p LEFT JOIN ep ON ep.node_id = p.p_partkey
WHERE ep.node_id IS NULL
"""


def quality_metrics(top_k: int = 10, gold_mod: int = 4) -> str:
    """A16 search-quality metrics (semantic-search-benchmarking.md:33-46):
    top1/top3/top10, recall@10, precision@10, MRR, duplicate rate over the
    synthetic per-tenant gold sets."""
    return f"""
WITH results AS (
  SELECT source AS query_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank,
         'doc_' || CAST(doc_id AS VARCHAR) AS file
  FROM documents QUALIFY rank <= {top_k}
),
gold AS (
  SELECT source AS query_id, 'doc_' || CAST(doc_id AS VARCHAR) AS file
  FROM documents WHERE doc_id % {gold_mod} = 0
),
hits AS (
  SELECT r.query_id, r.rank FROM results r JOIN gold g
  ON g.query_id = r.query_id AND g.file = r.file
),
per_q_hit AS (
  SELECT query_id, min(rank) AS first_hit, count(*) AS n_hits
  FROM hits GROUP BY query_id
),
gold_sizes AS (SELECT query_id, count(*) AS n_gold FROM gold GROUP BY query_id),
res_stats AS (
  SELECT query_id, count(*) AS n_results, count(DISTINCT file) AS n_distinct
  FROM results GROUP BY query_id
),
per_q AS (
  SELECT g.query_id,
         coalesce(h.first_hit, 1000000000) AS first_hit,
         coalesce(h.n_hits, 0) AS n_hits,
         g.n_gold,
         coalesce(r.n_results, 0) AS n_results,
         coalesce(r.n_distinct, 0) AS n_distinct
  FROM gold_sizes g
  LEFT JOIN per_q_hit h USING (query_id)
  LEFT JOIN res_stats r USING (query_id)
)
SELECT round(avg(CASE WHEN first_hit <= 1 THEN 1.0 ELSE 0.0 END), 6) AS top1,
       round(avg(CASE WHEN first_hit <= 3 THEN 1.0 ELSE 0.0 END), 6) AS top3,
       round(avg(CASE WHEN first_hit <= 10 THEN 1.0 ELSE 0.0 END), 6) AS top10,
       round(avg(n_hits * 1.0 / n_gold), 6) AS recall_at_10,
       round(avg(CASE WHEN n_results > 0 THEN n_hits * 1.0 / n_results
                      ELSE 0.0 END), 6) AS precision_at_10,
       round(avg(CASE WHEN first_hit <= 10 THEN 1.0 / first_hit
                      ELSE 0.0 END), 6) AS mrr,
       round(avg(CASE WHEN n_results > 0
                      THEN 1.0 - n_distinct * 1.0 / n_results
                      ELSE 0.0 END), 6) AS duplicate_rate
FROM per_q
"""


def adjacency_export(cap: int = 500) -> str:
    """G9 adjacency export: sorted deduped undirected neighbor list per
    node of the capped co-occurrence subgraph, pipe-joined for a
    hash-stable string column."""
    return f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
und AS (SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub)
SELECT u AS node_id,
       CAST(count(*) AS INT) AS n_neighbors,
       array_to_string(list_sort(list(DISTINCT v)), '|') AS neighbors
FROM und GROUP BY u
"""


def leiden_invariants(cap: int = 500) -> str:
    """G7 hard value signal — with a documented asymmetry. Only
    n_nodes / n_assigned / n_graph_components are INDEPENDENTLY
    recomputed here from the co-occurrence edges (coverage, plus the
    component count via a recursive min-reachable-label CTE). The
    violation counters and booleans are CONSTANTS asserting the value a
    correct run must produce (mod.rs local-move stability, refine.rs
    connectivity guarantee, DOM-01 min-label determinism, CPM >= the
    singleton baseline): the oracle cannot see the Spark partition —
    this string is built with no data access and DuckDB sees only the
    base tables — so those checks are performed by the Spark-side audit
    code and this row pins their expected outcome rather than
    re-deriving it. disconnected_communities specifically is now
    DOUBLE-computed on the Spark side (recursive-DFS _connected_pieces
    AND distributed min-label CC over the community-induced subgraph,
    leiden.py) with a hard AssertionError on disagreement, so the
    pinned 0 is backed by two mechanically independent implementations
    rather than one self-asserting pass. The
    n_graph_components column exists precisely to keep that audit code
    honest: it is produced by the SAME _connected_pieces DFS the
    disconnected_communities check uses, but over the whole capped graph
    — a pure graph property SQL can verify — so a bug in the DFS breaks
    the hash match even though the per-community counters are pinned."""
    return f"""
WITH RECURSIVE {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM und),
reach(v, lbl) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.v
),
comp AS (SELECT v, min(lbl) AS rep FROM reach GROUP BY v)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_assigned,
       CAST(0 AS BIGINT) AS dup_assignments,
       CAST(0 AS BIGINT) AS localmove_violations,
       CAST(0 AS BIGINT) AS disconnected_communities,
       CAST(0 AS BIGINT) AS label_min_violations,
       TRUE AS split_coverage_ok,
       TRUE AS cpm_ge_singletons,
       CAST(count(DISTINCT rep) AS BIGINT) AS n_graph_components
FROM comp
"""


def graph_triangles(cap_sql: str = "(SELECT count(*) // 4 FROM part)") -> str:
    """Per-node triangle counts on the capped co-occurrence subgraph —
    the SQL twin of graph.triangle_counts, replaying the SAME
    degree-ordered orientation (key = deg*10^12 + node_id) so the wedge
    and closing joins are bit-identical in structure, not just in
    result."""
    return f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
deg AS (SELECT u AS node_id, count(*) AS d FROM und GROUP BY u),
keyed AS (SELECT node_id, d * 1000000000000 + node_id AS k FROM deg),
o AS MATERIALIZED (
  SELECT e.u AS src, e.v AS dst, ks.k AS ks, kd.k AS kd
  FROM und e
  JOIN keyed ks ON ks.node_id = e.u
  JOIN keyed kd ON kd.node_id = e.v
  WHERE ks.k < kd.k
),
w AS (
  SELECT x.src AS a, x.dst AS b, y.dst AS c
  FROM o x JOIN o y ON x.src = y.src AND x.kd < y.kd
),
t AS (SELECT a, b, c FROM w JOIN o z ON z.src = w.b AND z.dst = w.c),
ex AS (SELECT unnest([a, b, c]) AS node_id FROM t)
SELECT node_id, count(*) AS n_triangles FROM ex GROUP BY node_id
"""


def graph_clustering_coeff(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
) -> str:
    """Local clustering coefficient — graph_triangles' CTE chain joined
    to the simple undirected degrees, cc = 2T/(d(d-1))."""
    return f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
deg AS (SELECT u AS node_id, count(*) AS d FROM und GROUP BY u),
keyed AS (SELECT node_id, d * 1000000000000 + node_id AS k FROM deg),
o AS MATERIALIZED (
  SELECT e.u AS src, e.v AS dst, ks.k AS ks, kd.k AS kd
  FROM und e
  JOIN keyed ks ON ks.node_id = e.u
  JOIN keyed kd ON kd.node_id = e.v
  WHERE ks.k < kd.k
),
w AS (
  SELECT x.src AS a, x.dst AS b, y.dst AS c
  FROM o x JOIN o y ON x.src = y.src AND x.kd < y.kd
),
t AS (SELECT a, b, c FROM w JOIN o z ON z.src = w.b AND z.dst = w.c),
ex AS (SELECT unnest([a, b, c]) AS node_id FROM t),
tri AS (SELECT node_id, count(*) AS n_triangles FROM ex GROUP BY node_id)
SELECT deg.node_id,
       deg.d AS degree,
       coalesce(tri.n_triangles, 0) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN round(2.0 * coalesce(tri.n_triangles, 0)
                       / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS clustering_coeff
FROM deg LEFT JOIN tri USING (node_id)
"""


def graph_kcore(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
    k: int = 20,
    n_iters: int = 30,
) -> str:
    """k-core membership + within-core degree on the capped co-occurrence
    subgraph — n_iters unrolled peeling rounds (the dedup_survivors
    unroll pattern); the Spark side's early exit fires only at the
    fixpoint, so both engines compute the identical round sequence."""
    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
e0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
)"""
    ]
    for i in range(n_iters):
        parts.append(
            f""",
kp{i} AS MATERIALIZED (SELECT u FROM e{i} GROUP BY u HAVING count(*) >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i} e
  JOIN kp{i} a ON a.u = e.u JOIN kp{i} b ON b.u = e.v
)"""
        )
    parts.append(
        f"""
SELECT u AS node_id, count(*) AS core_degree FROM e{n_iters} GROUP BY u"""
    )
    return "".join(parts)


def leiden_membership(cap: int = 500) -> str:
    """Oracle for the leiden_communities membership-invariant projection:
    a correct deterministic Leiden run assigns every node of the capped
    subgraph exactly once, labels each community by its min member id,
    and keeps every size≥2 membership connected — so the expected table
    is constant-true over the node universe, derived from the edges
    alone. Any clustering defect flips a bit (or the row count) on the
    Spark side and hash-fails."""
    return f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
nodes AS (
  SELECT DISTINCT node_id FROM (
    SELECT src AS node_id FROM sub UNION ALL SELECT dst FROM sub
  )
)
SELECT node_id,
       TRUE AS assigned_once,
       TRUE AS min_labeled,
       TRUE AS connected_membership
FROM nodes
"""


def harmonic_exact(cap: int = 40, max_depth: int = 12) -> str:
    """Harmonic centrality on the capped co-occurrence subgraph — the
    SQL twin of graph.harmonic_centrality with sampling off: H(v) =
    Σ 1/min-dist over the unrolled walk-matrix depths (unreachable
    pairs absent → contribute 0). Shares betweenness_exact's walk
    machinery; fails loudly (value mismatch) if the subgraph diameter
    ever exceeds max_depth."""
    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
w1 AS MATERIALIZED (SELECT u AS s, v, CAST(1 AS BIGINT) AS c FROM und)"""
    ]
    for d in range(1, max_depth):
        parts.append(
            f""",
w{d + 1} AS MATERIALIZED (
  SELECT w.s, e.v, CAST(sum(w.c) AS BIGINT) AS c
  FROM w{d} w JOIN und e ON w.v = e.u GROUP BY 1, 2
)"""
        )
    wall = "\n  UNION ALL ".join(
        f"SELECT s, v, {d} AS d FROM w{d}" for d in range(1, max_depth + 1)
    )
    parts.append(
        f""",
wall AS MATERIALIZED (SELECT * FROM ({wall}) WHERE s <> v),
mind AS (SELECT s, v, min(d) AS d FROM wall GROUP BY 1, 2),
allnodes AS (SELECT DISTINCT u AS node_id FROM und)
SELECT an.node_id,
       round(coalesce(h.h, 0.0), 6) AS harmonic
FROM allnodes an
LEFT JOIN (
  SELECT v AS node_id, sum(1.0 / d) AS h FROM mind GROUP BY v
) h USING (node_id)
"""
    )
    return "".join(parts)


def eccentricity_exact(cap: int = 40, max_depth: int = 12) -> str:
    """Per-node eccentricity on the capped co-occurrence subgraph — max
    min-distance per node over the unrolled walk-matrix depths (the
    harmonic/betweenness machinery)."""
    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
w1 AS MATERIALIZED (SELECT u AS s, v, CAST(1 AS BIGINT) AS c FROM und)"""
    ]
    for d in range(1, max_depth):
        parts.append(
            f""",
w{d + 1} AS MATERIALIZED (
  SELECT w.s, e.v, CAST(sum(w.c) AS BIGINT) AS c
  FROM w{d} w JOIN und e ON w.v = e.u GROUP BY 1, 2
)"""
        )
    wall = "\n  UNION ALL ".join(
        f"SELECT s, v, {d} AS d FROM w{d}" for d in range(1, max_depth + 1)
    )
    parts.append(
        f""",
wall AS MATERIALIZED (SELECT * FROM ({wall}) WHERE s <> v),
mind AS (SELECT s, v, min(d) AS d FROM wall GROUP BY 1, 2),
allnodes AS (SELECT DISTINCT u AS node_id FROM und)
SELECT an.node_id,
       CAST(coalesce(e.ecc, 0) AS INT) AS eccentricity
FROM allnodes an
LEFT JOIN (SELECT v AS node_id, max(d) AS ecc FROM mind GROUP BY v) e
  USING (node_id)
"""
    )
    return "".join(parts)


def two_hop_chain(n_files: int = 500, funcs: int = 20) -> str:
    """G1 2-hop at the reference bench's chain-graph cardinality
    (graph_bench.rs:209-230). Closed form: on a per-file linear chain the
    depth-d neighbor of a file-head seed s is s+d (chain length 20 > 2,
    so no truncation and no cross-file reach)."""
    return f"""
SELECT CAST(s.i * {funcs} AS BIGINT) AS seed,
       CAST(s.i * {funcs} + d.d AS BIGINT) AS node_id,
       CAST(d.d AS INTEGER) AS depth
FROM generate_series(0, {n_files - 1}) s(i), (VALUES (1), (2)) d(d)
"""


def betweenness_exact(
    cap: int = 40, max_depth: int = 12, sample_k: int | None = None
) -> str:
    """G8 betweenness on the capped co-occurrence subgraph — the SQL
    twin of operators/graph.betweenness (exact with sample_k None).

    Pair-counting formulation (equivalent to Brandes' accumulation):
      sigma(s,v)  = #shortest s->v paths = walk count at minimal depth
                    (a minimal-length walk cannot revisit a vertex)
      raw(v)      = sum over ordered pairs s!=t, v not in {s,t}, of
                    sigma(s,v)*sigma(v,t)/sigma(s,t)
                    where dist(s,v)+dist(v,t)=dist(s,t)
      centrality  = least(raw * 2/((n-1)(n-2)), 1.0)   -- the reference's
                    un-halved normalization (betweenness.rs:103-128)
    With sample_k, sources s are restricted to the first k node ids
    ascending and raw is scaled by n/k — EXACTLY the driver harness's
    Bader sampling convention (betweenness.rs:49-184), which is what
    lets the sampled Spark run hash-match this oracle.
    Walk counts are unrolled matrix powers w1..w{max_depth}; the parity
    test fails loudly if the subgraph diameter ever exceeds max_depth."""
    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed WHERE src < {cap} AND dst < {cap}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
nn_bc AS (SELECT CAST(count(DISTINCT u) AS DOUBLE) AS n FROM und),
w1 AS MATERIALIZED (SELECT u AS s, v, CAST(1 AS BIGINT) AS c FROM und)"""
    ]
    for d in range(1, max_depth):
        parts.append(
            f""",
w{d + 1} AS MATERIALIZED (
  SELECT w.s, e.v, CAST(sum(w.c) AS BIGINT) AS c
  FROM w{d} w JOIN und e ON w.v = e.u GROUP BY 1, 2
)"""
        )
    wall = "\n  UNION ALL ".join(
        f"SELECT s, v, {d} AS d, c FROM w{d}" for d in range(1, max_depth + 1)
    )
    if sample_k is None:
        src_filter = ""
        scale = "1.0"
    else:
        src_filter = f" AND a.s IN (SELECT node_id FROM srcs)"
        scale = f"nn_bc.n / (SELECT CAST(count(*) AS DOUBLE) FROM srcs)"
    parts.append(
        f""",
wall AS MATERIALIZED (
  SELECT * FROM ({wall}) WHERE s <> v
),
mind AS (SELECT s, v, min(d) AS d FROM wall GROUP BY 1, 2),
sp AS MATERIALIZED (
  SELECT m.s, m.v, m.d, w.c AS sig
  FROM mind m JOIN wall w ON w.s = m.s AND w.v = m.v AND w.d = m.d
),
allnodes AS (SELECT DISTINCT u AS node_id FROM und),
srcs AS (SELECT node_id FROM allnodes ORDER BY node_id LIMIT {sample_k or 0}),
raw AS (
  SELECT a.v AS node_id,
         sum(CAST(a.sig AS DOUBLE) * b.sig / c.sig) AS r
  FROM sp a
  JOIN sp b ON b.s = a.v
  JOIN sp c ON c.s = a.s AND c.v = b.v
  WHERE a.d + b.d = c.d AND a.s <> b.v AND a.v <> b.v{src_filter}
  GROUP BY 1
)
SELECT an.node_id,
       round(least(coalesce(r.r, 0.0)
                     * (2.0 / ((nn_bc.n - 1) * (nn_bc.n - 2)) * ({scale})),
                   1.0), 6) AS centrality
FROM allnodes an
CROSS JOIN nn_bc
LEFT JOIN raw r ON r.node_id = an.node_id
"""
    )
    return "".join(parts)


# Shared CTEs for the derived-file-event family (S10/W2/W3/W6): base store
# from documents, deterministic file events from the events stream,
# last-event-wins debounce on raw nanos.
_FILE_EVENTS_CTES = """
base AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS path, text AS content
  FROM documents
),
fe AS (
  SELECT (event_id * 7919) % 600 AS pid,
         CASE WHEN event_type = 'purchase' THEN 'remove' ELSE 'upsert' END
           AS event_type,
         epoch_ns(ts) AS tsn
  FROM events
),
fe2 AS (
  SELECT 'doc_' || CAST(f.pid AS VARCHAR) AS path, f.event_type, f.tsn,
         CASE WHEN f.pid % 5 = 0
              THEN coalesce(b.content, 'new_' || CAST(f.pid AS VARCHAR))
              ELSE 'new_' || CAST(f.pid AS VARCHAR) END AS content
  FROM fe f
  LEFT JOIN base b ON b.path = 'doc_' || CAST(f.pid AS VARCHAR)
),
last AS MATERIALIZED (
  SELECT path, event_type, content FROM (
    SELECT *, row_number() OVER (
      PARTITION BY path ORDER BY tsn DESC, event_type DESC) AS rn
    FROM fe2
  ) WHERE rn = 1
)"""

_FILE_EVENTS_MERGE = f"""
WITH {_FILE_EVENTS_CTES},
removes AS (SELECT path FROM last WHERE event_type = 'remove'),
ups AS (SELECT path, md5(content) AS new_hash FROM last
        WHERE event_type = 'upsert'),
b2 AS (SELECT path, md5(content) AS old_hash FROM base),
m AS (
  SELECT coalesce(b2.path, u.path) AS path, u.new_hash, b2.old_hash
  FROM b2 FULL OUTER JOIN ups u ON b2.path = u.path
)
SELECT m.path,
       coalesce(m.new_hash, m.old_hash) AS file_hash,
       {{status_expr}} AS status
FROM m LEFT JOIN removes r ON r.path = m.path
WHERE r.path IS NULL
"""


def ingest_apply_events() -> str:
    """S10+W1+W5 batch apply (streaming/ingest.apply_events): debounce on
    raw nanos, remove/upsert split, content-hash-gated merge. Content is a
    pure function of path, so the result is invariant to timestamp ties."""
    return _FILE_EVENTS_MERGE.format(
        status_expr="""CASE WHEN m.old_hash IS NULL THEN 'inserted'
            WHEN m.new_hash IS NULL OR m.new_hash = m.old_hash THEN 'kept'
            ELSE 'updated' END"""
    )


def ingest_idempotency() -> str:
    """W2: applying the same debounced batch twice must converge — the
    second application returns the first's (path, file_hash) set with
    every row 'kept' (idempotency_key UNIQUE, sql.rs:28-30). The oracle
    computes the single application and asserts exactly that state."""
    return _FILE_EVENTS_MERGE.format(status_expr="'kept'")


def dlq_decisions() -> str:
    """W3 dead-letter decision table: upserts of pid % 97 == 0 paths carry
    NULL content in the probe and must be routed to the DLQ with reason
    'null_content' (sql.rs:32-45); removes and well-formed upserts are
    never dead-lettered."""
    return """
WITH fe AS (
  SELECT (event_id * 7919) % 600 AS pid,
         CASE WHEN event_type = 'purchase' THEN 'remove' ELSE 'upsert' END
           AS event_type
  FROM events
)
SELECT DISTINCT 'doc_' || CAST(pid AS VARCHAR) AS path, event_type,
       'null_content' AS reason
FROM fe
WHERE pid % 97 = 0 AND event_type = 'upsert'
"""


def reconcile_diff() -> str:
    """W6 startup reconciliation: full-outer hash diff of the post-events
    filesystem snapshot vs the pre-events store; in-sync paths excluded."""
    return f"""
WITH {_FILE_EVENTS_CTES},
removes AS (SELECT path FROM last WHERE event_type = 'remove'),
upsC AS (SELECT path, content FROM last WHERE event_type = 'upsert'),
fs AS (
  SELECT coalesce(b.path, u.path) AS path,
         coalesce(u.content, b.content) AS content
  FROM base b FULL OUTER JOIN upsC u ON b.path = u.path
  LEFT JOIN removes r ON r.path = coalesce(b.path, u.path)
  WHERE r.path IS NULL
),
store AS (SELECT path, md5(content) AS store_hash FROM base)
SELECT coalesce(f.path, s.path) AS path,
       CASE WHEN s.path IS NULL THEN 'missing_in_store'
            WHEN f.path IS NULL THEN 'stale_in_store'
            WHEN md5(f.content) <> s.store_hash THEN 'hash_mismatch'
            ELSE 'ok' END AS status
FROM fs f FULL OUTER JOIN store s ON f.path = s.path
WHERE CASE WHEN s.path IS NULL THEN 'missing_in_store'
           WHEN f.path IS NULL THEN 'stale_in_store'
           WHEN md5(f.content) <> s.store_hash THEN 'hash_mismatch'
           ELSE 'ok' END <> 'ok'
"""


def tier1_tags() -> str:
    """A11 tier-1 static rule tags off the chunk store derivation."""
    return f"""
WITH {duckdb_chunk_text_sql()},
{CHUNK_META_SQL}
SELECT doc_id, chunk_index, file_type,
       array_to_string(tags, '|') AS tags,
       coalesce(array_to_string(concept_tags, '|'), '') AS concept_tags,
       component_id,
       CASE WHEN collection = 'libraries'
            THEN 'lib' || CAST(doc_id % 3 AS VARCHAR) END AS library_name,
       CASE WHEN collection = 'libraries'
            THEN '/libs/lib' || CAST(doc_id % 3 AS VARCHAR) END AS library_path
FROM meta
"""


def predicate_stack(
    tenants: tuple[str, ...],
    branch: str,
    tags: tuple[str, ...],
    glob_prefix: str,
    glob_regex: str,
    component: str,
) -> str:
    """P1-P8 stacked filter (filters.rs:88-299) over the chunk store:
    collection routing, tenant IN-set, branch array-contains, tag OR-group
    across concept_tags+tags, glob prefix + regex verify, component
    exact-or-dotted-prefix, tombstone must_not. Chunk metadata mirrors
    store.build_chunks column for column."""
    tenant_in = ", ".join(f"'{t}'" for t in tenants)
    tag_or = " OR ".join(
        f"list_contains(concept_tags, '{t}') OR list_contains(tags, '{t}')"
        for t in tags
    )
    return f"""
WITH {duckdb_chunk_text_sql()},
{CHUNK_META_SQL}
SELECT md5(tenant_id || '|' || relative_path || '|'
           || CAST(chunk_index AS VARCHAR)) AS point_id,
       collection, tenant_id, relative_path,
       CAST(chunk_index AS INT) AS chunk_index, component_id, file_type
FROM meta
WHERE collection IN ('projects', 'libraries')
  AND tenant_id IN ({tenant_in})
  AND list_contains(branches, '{branch}')
  AND ({tag_or})
  AND starts_with(relative_path, '{glob_prefix}')
  AND regexp_matches(relative_path, '{glob_regex}')
  AND (component_id = '{component}'
       OR starts_with(component_id, '{component}.'))
  AND NOT coalesce(deleted, false)
ORDER BY point_id
"""


def find_path(
    source: int,
    target: int | None = None,
    max_depth: int = 3,
    pad: int = 6,
) -> str:
    """G2 find_path — the reference's recursive-CTE shape verbatim
    (sqlite_store.rs:481-502): BFS rows (node_id, depth, path) with the
    comma-joined path accumulator and the INSTR cycle guard, filtered to
    the target, first row by depth. Ids are zero-padded to equal width so
    (a) INSTR substring membership is exact and (b) `path ASC` string
    order equals hop-sequence order — the deterministic tiebreak the
    Spark operator uses in place of SQLite's exploration order.

    target=None derives the endpoint FROM THE DATA — the smallest node
    reachable at exactly depth 2 from `source` (2-hop frontier minus the
    1-hop frontier minus the source) — mirroring the Spark query, so the
    row stays non-empty under any fixture regeneration (round 4's
    hardcoded target went unreachable when the fixtures were rebuilt and
    the check turned vacuous)."""
    p = f"lpad(CAST(e.dst AS VARCHAR), {pad}, '0')"
    if target is None:
        tgt_ctes = f""",
hop1 AS (SELECT DISTINCT dst FROM ed WHERE src = {source}),
tgt AS (
  SELECT min(e.dst) AS t
  FROM ed e JOIN hop1 h ON e.src = h.dst
  WHERE e.dst <> {source} AND e.dst NOT IN (SELECT dst FROM hop1)
)"""
        tgt_expr = "(SELECT t FROM tgt)"
    else:
        tgt_ctes = ""
        tgt_expr = str(target)
    return f"""
WITH RECURSIVE {_COOC_EDGES}{tgt_ctes},
bfs(node_id, depth, path) AS (
  SELECT {source} AS node_id, 0 AS depth,
         lpad(CAST({source} AS VARCHAR), {pad}, '0') AS path
  UNION ALL
  SELECT e.dst, bfs.depth + 1, bfs.path || ',' || {p}
  FROM bfs JOIN ed e ON e.src = bfs.node_id
  WHERE bfs.depth < {max_depth} AND instr(bfs.path, {p}) = 0
)
SELECT CAST(node_id AS BIGINT) AS node_id, CAST(depth AS INT) AS depth, path
FROM bfs WHERE node_id = {tgt_expr}
ORDER BY depth ASC, path ASC LIMIT 1
"""


def label_propagation(
    cap: int = 40, sweeps: int = 6, max_n: int = 40, min_size: int = 2
) -> str:
    """G6 deterministic LPA (community.rs:114-149) over the co-occurrence
    subgraph with both endpoints < `cap` (bounded so the ASYNCHRONOUS
    in-sweep update order is expressible as an unrolled per-node CTE
    chain). Each of the `sweeps`×`max_n` steps updates exactly one node
    (by ascending-node-id rank) to its most-frequent neighbor label with
    MIN-label tiebreak, reading the PREVIOUS step's state — i.e. later
    nodes see earlier updates within the same sweep, the property that
    prevents 2-cycle oscillation. Steps whose rank has no node are no-ops,
    as are whole sweeps after the fixed point, so a fixed `sweeps` on both
    engines compares equal regardless of when convergence happens."""
    parts = [
        f"""
WITH sub AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < {cap} AND b.l_partkey < {cap}
  GROUP BY 1, 2
),
und AS MATERIALIZED (SELECT src, dst FROM sub UNION SELECT dst, src FROM sub),
s0 AS MATERIALIZED (
  SELECT node_id, row_number() OVER (ORDER BY node_id) AS rn, node_id AS label
  FROM (SELECT DISTINCT src AS node_id FROM und)
)"""
    ]
    t = 0
    for _sweep in range(sweeps):
        for p in range(1, max_n + 1):
            t += 1
            parts.append(
                f""",
c{t} AS (
  SELECT st.label AS lbl, count(*) AS c
  FROM s{t - 1} cur
  JOIN und u ON u.src = cur.node_id
  JOIN s{t - 1} st ON st.node_id = u.dst
  WHERE cur.rn = {p}
  GROUP BY st.label
),
s{t} AS MATERIALIZED (
  SELECT n.node_id, n.rn,
         CASE WHEN n.rn = {p}
              THEN coalesce((SELECT lbl FROM c{t} ORDER BY c DESC, lbl ASC LIMIT 1), n.label)
              ELSE n.label END AS label
  FROM s{t - 1} n
)"""
            )
    parts.append(
        f""",
sz AS (SELECT label, count(*) AS c FROM s{t} GROUP BY label)
SELECT s.node_id, s.label AS community
FROM s{t} s JOIN sz USING (label)
WHERE sz.c >= {min_size}
"""
    )
    return "".join(parts)


def cooccurrence_top_pairs(k: int = 50) -> str:
    return f"""
WITH {_COOC_EDGES}
SELECT src, dst, weight FROM ed
ORDER BY weight DESC, src ASC, dst ASC LIMIT {k}
"""


def tfidf_keywords(top_n: int = 5) -> str:
    return f"""
WITH {_tf_df_ctes()},
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
           AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nn
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
           AS rnk
  FROM scored
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rnk
FROM r WHERE rnk <= {top_n} AND tfidf > 0
"""


_CENTROID_CTES = """
cent AS MATERIALIZED (
  SELECT label, i AS dim, avg(CAST(embedding[i] AS DOUBLE)) AS v
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
  GROUP BY label, i
),
cw AS MATERIALIZED (SELECT label, list(v ORDER BY dim) AS centroid FROM cent GROUP BY label)
"""


def label_centroids() -> str:
    return """
SELECT label, i - 1 AS dim, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS value
FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i - 1
"""


def centroid_rerank(top_k: int = 3) -> str:
    cos = duckdb_cosine_sql("e.embedding", "cw.centroid")
    return f"""
WITH {_CENTROID_CTES},
scored AS (
  SELECT e.label, e.vec_id, {cos} AS score
  FROM embeddings e JOIN cw USING (label)
),
r AS (
  SELECT label, vec_id, score,
         row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM scored
)
SELECT label, vec_id, round(score, 6) AS score, rnk FROM r WHERE rnk <= {top_k}
"""


def _taxonomy_fin_ctes(threshold: float, score_gap: float) -> str:
    """Shared CTE chain for the tier-2 taxonomy gates, ending in
    fin(vec_id, term, category, score, rn)."""
    dbl = (
        "list_transform(generate_series(1, len(embedding)), "
        "i -> CAST(embedding[i] AS DOUBLE))"
    )
    cos = duckdb_cosine_sql("e.embedding", "t.tax_emb")
    return f"""
WITH {_CENTROID_CTES},
firsts AS MATERIALIZED (
  SELECT label, {dbl} AS fe
  FROM (SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn = 1
),
tax AS MATERIALIZED (
  SELECT 'lab' || CAST(label AS VARCHAR) || '_centroid' AS term,
         'lab' || CAST(label AS VARCHAR) AS category, centroid AS tax_emb
  FROM cw
  UNION ALL
  SELECT 'lab' || CAST(label AS VARCHAR) || '_first' AS term,
         'lab' || CAST(label AS VARCHAR) AS category, fe AS tax_emb
  FROM firsts
),
m AS (
  SELECT e.vec_id, t.term, t.category, {cos} AS score
  FROM embeddings e CROSS JOIN tax t
),
flt AS (SELECT * FROM m WHERE score >= {threshold}),
k AS (
  SELECT *,
         row_number() OVER (PARTITION BY vec_id, category
                            ORDER BY score DESC, term ASC) AS cat_rn,
         max(score) OVER (PARTITION BY vec_id, category) AS cat_best
  FROM flt
),
kept AS (
  SELECT * FROM k
  WHERE cat_rn = 1 OR cat_best - score > {3 * score_gap}
),
fin AS (
  SELECT vec_id, term, category, score,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, term ASC)
           AS rn
  FROM kept
)"""


def taxonomy_tags(
    threshold: float = 0.35, max_tags: int = 10, score_gap: float = 0.02
) -> str:
    return (
        _taxonomy_fin_ctes(threshold, score_gap)
        + f"""
SELECT vec_id, term, round(score, 6) AS score, category
FROM fin WHERE rn <= {max_tags}
"""
    )


def concept_layer(
    threshold: float = 0.35, max_tags: int = 10, score_gap: float = 0.02
) -> str:
    """G13: surviving taxonomy tags as COVERS_TOPIC edges to global-tenant
    concept nodes, with cosine confidence and DepthLevel bands
    (graph/mod.rs:68-75,160-165,305-371)."""
    # band on the 6dp-rounded score, matching the Spark side (which bands
    # the taxonomy_tags output), so borderline raw scores cannot straddle
    s = "round(score, 6)"
    depth = f"""CASE WHEN {s} >= 0.80 THEN 'reference'
            WHEN {s} >= 0.65 THEN 'rigorous'
            WHEN {s} >= 0.50 THEN 'intermediate'
            WHEN {s} >= 0.40 THEN 'introductory'
            ELSE 'qualitative' END"""
    ordinal = f"""CASE WHEN {s} >= 0.80 THEN 4
            WHEN {s} >= 0.65 THEN 3
            WHEN {s} >= 0.50 THEN 2
            WHEN {s} >= 0.40 THEN 1
            ELSE 0 END"""
    return (
        _taxonomy_fin_ctes(threshold, score_gap)
        + f"""
SELECT vec_id,
       substr(sha256('__global__|taxonomy|' || term || '|concept'), 1, 16)
         AS concept_id,
       term, category,
       'COVERS_TOPIC' AS edge_type,
       round(score, 6) AS confidence,
       {depth} AS depth,
       CAST({ordinal} AS INT) AS depth_ordinal
FROM fin WHERE rn <= {max_tags}
"""
    )


def keyword_baskets(top_n: int = 5) -> str:
    return f"""
WITH {_tf_df_ctes()},
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
           AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nn
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
           AS rnk
  FROM scored
),
kws AS (SELECT doc_id, term FROM r WHERE rnk <= {top_n} AND tfidf > 0),
b AS (
  SELECT d.source, list_sort(list_distinct(list(k.term))) AS ks
  FROM kws k JOIN documents d USING (doc_id)
  GROUP BY d.source
)
SELECT source, len(ks) AS n_keywords, array_to_string(ks, '|') AS keywords FROM b
"""


def tag_expansion_sparse(
    query_term: str = "spark",
    source: str = "src0",
    expansion_weight: float = 0.5,
    top_n: int = 5,
    max_keywords: int = 10,
    threshold: float = 0.075,
    k: int = 20,
) -> str:
    """R7 tag-basket expansion: the query term joined by the source's
    keyword basket at weight 0.5 (original-weight-wins), scored as the
    weighted sparse dot product (expansion.rs:24-66, flow.rs:265-300)."""
    return f"""
WITH {_tf_df_ctes()},
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
           AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nn
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
           AS rnk
  FROM scored
),
kws AS (SELECT doc_id, term FROM r WHERE rnk <= {top_n} AND tfidf > 0),
bask AS (
  SELECT DISTINCT k.term FROM kws k JOIN documents d USING (doc_id)
  WHERE d.source = '{source}' ORDER BY term LIMIT {max_keywords}
),
qw AS (
  SELECT '{query_term}' AS term, CAST(1.0 AS DOUBLE) AS qw
  UNION ALL
  SELECT term, CAST({expansion_weight} AS DOUBLE) FROM bask
  WHERE term <> '{query_term}'
),
wsc AS (
  SELECT tf.doc_id,
         sum(qw.qw * greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
             * ({K1} * tf.tf) / (tf.tf + {K1})) AS score
  FROM tf JOIN qw USING (term) JOIN dfreq USING (term) CROSS JOIN nn
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM wsc
WHERE score >= CAST({threshold} AS DOUBLE)
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


_CODE_DOCS_CTE = """
cdocs AS MATERIALIZED (
  SELECT source AS tenant_id, 'f' || CAST(doc_id AS VARCHAR) AS file_path,
         'def fn' || CAST(doc_id % 40 AS VARCHAR) || '(): fn'
           || CAST((doc_id + 20) % 40 AS VARCHAR) || '()' AS content
  FROM documents
),
syms AS MATERIALIZED (
  SELECT tenant_id, file_path,
         unnest(list_distinct(
           regexp_extract_all(content,
             '(?:def|fn|class|struct|trait)\\s+([A-Za-z_][A-Za-z0-9_]*)', 1)
         )) AS symbol_name,
         content
  FROM cdocs
),
gnodes AS MATERIALIZED (
  SELECT DISTINCT
    substr(sha256(tenant_id || '|' || file_path || '|' || symbol_name
                  || '|function'), 1, 16) AS node_id,
    tenant_id, symbol_name, file_path
  FROM syms
),
ctoks AS MATERIALIZED (
  SELECT tenant_id, file_path,
         unnest(list_distinct(
           regexp_extract_all(content,
             '(?:^|[^A-Za-z0-9_])([A-Za-z_][A-Za-z0-9_]*)\\(', 1)
         )) AS callee
  FROM cdocs
)
"""


# the CALLS edge derivation, shared by graph_extract_calls and the SCC
# oracle so the edge definition cannot drift between them
_CALLS_CTE = """calls AS (
  SELECT DISTINCT c.tenant_id,
    substr(sha256(c.tenant_id || '|' || c.file_path || '|' || c.symbol_name
                  || '|function'), 1, 16) AS source_node_id,
    n.node_id AS target_node_id,
    'CALLS' AS edge_type, c.file_path AS source_file,
    CAST(1.0 AS DOUBLE) AS weight
  FROM syms c
  JOIN ctoks k ON k.tenant_id = c.tenant_id AND k.file_path = c.file_path
  JOIN gnodes n ON n.tenant_id = c.tenant_id AND n.symbol_name = k.callee
  WHERE c.symbol_name <> n.symbol_name
)"""


def graph_extract_calls() -> str:
    """G11: CALLS edges over the synthetic code corpus with the reference's
    sha-based node/edge id schemes."""
    return f"""
WITH {_CODE_DOCS_CTE},
{_CALLS_CTE}
SELECT substr(sha256(tenant_id || '|' || source_node_id || '|'
                     || target_node_id || '|' || edge_type), 1, 16) AS edge_id,
       tenant_id, source_node_id, target_node_id, edge_type, source_file, weight
FROM calls
"""


def graph_scc() -> str:
    """Oracle for graph.strongly_connected_components over the CALLS
    symbol graph: scc_id(v) = min(u) over {v} union {u : v reaches u AND
    u reaches v}, with reachability as a recursive transitive closure of
    the SAME calls CTE the extraction oracle uses. Exact by definition —
    the distributed coloring+peel must agree node-for-node."""
    return f"""
WITH RECURSIVE {_CODE_DOCS_CTE},
{_CALLS_CTE},
e AS (
  SELECT DISTINCT source_node_id AS src, target_node_id AS dst FROM calls
),
nodes AS (
  SELECT src AS node_id FROM e UNION SELECT dst FROM e
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
),
mutual AS (
  SELECT a.src AS node_id, a.dst AS u
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
)
SELECT node_id, min(u) AS scc_id
FROM (
  SELECT node_id, node_id AS u FROM nodes
  UNION ALL
  SELECT node_id, u FROM mutual
)
GROUP BY node_id
"""


def narrative_explains() -> str:
    """G12: section nodes + EXPLAINS to unambiguous mentions; the
    tenant-ambiguous 'shared' symbol must produce no edge. chr(10) builds
    real newlines (SQL '\\n' is two chars, unlike Python)."""
    return """
WITH nn AS (SELECT count(*) AS n FROM documents),
cnodes AS (
  SELECT source AS tenant_id, 'c' || CAST(doc_id AS VARCHAR) AS file_path,
         'u' || CAST(doc_id AS VARCHAR) AS symbol_name
  FROM documents
  UNION ALL
  SELECT source, 'c' || CAST(doc_id AS VARCHAR), 'shared' FROM documents
),
uniq AS MATERIALIZED (
  SELECT tenant_id, symbol_name AS mention, min(nid) AS target_node_id
  FROM (
    SELECT tenant_id, symbol_name,
           substr(sha256(tenant_id || '|' || file_path || '|' || symbol_name
                         || '|function'), 1, 16) AS nid
    FROM cnodes
  )
  GROUP BY tenant_id, symbol_name HAVING count(*) = 1
),
ndocs AS (
  SELECT source AS tenant_id, 'd' || CAST(doc_id AS VARCHAR) AS file_path,
         '# overview' || chr(10) || 'see u'
           || CAST((doc_id + 100) % nn.n AS VARCHAR) || chr(10)
           || '# detail' || chr(10) || 'shared helpers' AS content
  FROM documents CROSS JOIN nn
),
secs AS MATERIALIZED (
  SELECT tenant_id, file_path, i - 1 AS section_idx, parts[i] AS section_text
  FROM (
    SELECT tenant_id, file_path,
           regexp_split_to_array(content, '(?m)^#+\\s*') AS parts
    FROM ndocs
  ), LATERAL unnest(generate_series(1, len(parts))) AS t(i)
  WHERE length(trim(parts[i])) > 0
)
SELECT s.tenant_id,
       substr(sha256(s.tenant_id || '|' || s.file_path || '|'
                     || CAST(s.section_idx AS VARCHAR)
                     || '|document_section'), 1, 16) AS source_node_id,
       u.target_node_id, 'EXPLAINS' AS edge_type,
       s.file_path AS source_file, CAST(1.0 AS DOUBLE) AS weight
FROM secs s JOIN uniq u USING (tenant_id)
WHERE contains(s.section_text, u.mention)
"""


def _nid_sql(tenant: str, file_path: str, name: str) -> str:
    return (
        f"substr(sha256({tenant} || '|' || {file_path} || '|' || {name}"
        f" || '|function'), 1, 16)"
    )


def stub_resolution() -> str:
    """G10: expected post-resolution edge set, derived analytically —
    unique-in-tenant stubs repoint to the single real def, 'common' stubs
    repoint to the source file's own def (same-file preference), missing
    stubs stay. edge_id keeps the ORIGINAL (stub) target hash."""
    mk = _nid_sql
    m = "CAST((d + 100) % nn.n AS VARCHAR)"
    d = "CAST(d AS VARCHAR)"
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS (
  SELECT source AS t, doc_id AS d, 'f' || CAST(doc_id AS VARCHAR) AS f
  FROM documents
),
e AS (
  SELECT t, f, {mk("t", "f", f"'r' || {d}")} AS src,
         {mk("t", "''", f"'r' || {m}")} AS dst_stub,
         {mk("t", f"'f' || {m}", f"'r' || {m}")} AS dst_final
  FROM base CROSS JOIN nn
  UNION ALL
  SELECT t, f, {mk("t", "f", f"'r' || {d}")},
         {mk("t", "''", "'common'")},
         {mk("t", "f", "'common'")}
  FROM base
  UNION ALL
  SELECT t, f, {mk("t", "f", f"'r' || {d}")},
         {mk("t", "''", f"'missing' || {d}")},
         {mk("t", "''", f"'missing' || {d}")}
  FROM base
)
SELECT substr(sha256(t || '|' || src || '|' || dst_stub || '|CALLS'), 1, 16)
         AS edge_id,
       t AS tenant_id, src AS source_node_id, dst_final AS target_node_id,
       'CALLS' AS edge_type, f AS source_file, CAST(1.0 AS DOUBLE) AS weight
FROM e
"""


def cross_boundary_2hop() -> str:
    """G4: bidirectional 2-hop frontier from n0 with destination-side tenant
    relaxation {src0, __global__, libx}; per-hop conf = weight × base-type
    confidence; MAX conf + MIN depth per reached node; seed excluded."""
    base = (
        "CASE et WHEN 'EXPLAINS' THEN CAST(0.6 AS DOUBLE)"
        " WHEN 'COVERS_TOPIC' THEN CAST(0.6 AS DOUBLE)"
        " WHEN 'IMPLEMENTS_CONCEPT' THEN CAST(0.7 AS DOUBLE)"
        " ELSE CAST(1.0 AS DOUBLE) END"
    )
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
vx AS MATERIALIZED (
  SELECT doc_id AS d, 'n' || CAST(doc_id AS VARCHAR) AS id,
         CASE doc_id % 4 WHEN 0 THEN 'src0' WHEN 1 THEN '__global__'
              WHEN 2 THEN 'libx' ELSE 'src1' END AS tenant
  FROM documents
),
ed AS MATERIALIZED (
  SELECT v.id AS s, 'n' || CAST((v.d * 3 + 1) % nn.n AS VARCHAR) AS t2,
         CASE v.d % 4 WHEN 0 THEN 'EXPLAINS' WHEN 1 THEN 'COVERS_TOPIC'
              WHEN 2 THEN 'IMPLEMENTS_CONCEPT' ELSE 'CALLS' END AS et,
         CAST(0.5 AS DOUBLE) + (v.d % 5) / CAST(10 AS DOUBLE) AS w
  FROM vx v CROSS JOIN nn
  UNION ALL
  SELECT v.id AS s, 'n' || CAST((v.d * 7 + 3) % nn.n AS VARCHAR) AS t2,
         'CALLS' AS et,
         CAST(0.4 AS DOUBLE) + (v.d % 3) / CAST(10 AS DOUBLE) AS w
  FROM vx v CROSS JOIN nn
),
allowed AS (SELECT id FROM vx WHERE tenant IN ('src0', '__global__', 'libx')),
und AS MATERIALIZED (
  SELECT u, v, hc FROM (
    SELECT s AS u, t2 AS v, w * {base} AS hc FROM ed
    UNION ALL
    SELECT t2 AS u, s AS v, w * {base} AS hc FROM ed
  ) x JOIN allowed a ON x.v = a.id
),
f1 AS MATERIALIZED (
  SELECT v AS node, max(hc) AS conf FROM und WHERE u = 'n0' GROUP BY v
),
f2 AS (
  SELECT und.v AS node, max(hc) AS conf FROM und JOIN f1 ON und.u = f1.node
  GROUP BY und.v
)
SELECT node AS node_id, round(max(conf), 6) AS confidence, min(depth) AS depth
FROM (
  SELECT node, conf, 1 AS depth FROM f1
  UNION ALL SELECT node, conf, 2 AS depth FROM f2
)
WHERE node <> 'n0'
GROUP BY node
"""


def parent_context() -> str:
    """R14: chunk-store point-id scheme md5(tenant|relpath|chunk_index);
    non-first chunks join their document's chunk 0 as parent unit."""
    return f"""
WITH {duckdb_chunk_text_sql()},
c2 AS (
  SELECT c.doc_id, c.chunk_index, c.content, d.source AS tenant,
         'src/' || d.source || '/doc_' || CAST(c.doc_id AS VARCHAR) || '.txt'
           AS rel
  FROM chunks c JOIN documents d USING (doc_id)
),
pts AS MATERIALIZED (
  SELECT md5(tenant || '|' || rel || '|' || CAST(chunk_index AS VARCHAR))
           AS point_id,
         md5(tenant || '|' || rel || '|0') AS parent_unit_id,
         doc_id, chunk_index, content
  FROM c2
)
SELECT a.point_id, a.parent_unit_id, b.content AS unit_text,
       'chunk' AS unit_type
FROM pts a JOIN pts b ON b.doc_id = a.doc_id AND b.chunk_index = 0
WHERE a.chunk_index > 0
"""


def graph_context() -> str:
    """R15: sorted deduped 1-hop caller/callee name lists per src0 node."""
    return f"""
WITH {_CODE_DOCS_CTE},
calls AS (
  SELECT DISTINCT c.tenant_id,
    substr(sha256(c.tenant_id || '|' || c.file_path || '|' || c.symbol_name
                  || '|function'), 1, 16) AS src_id,
    c.symbol_name AS caller_name,
    n.node_id AS dst_id, n.symbol_name AS callee_name
  FROM syms c
  JOIN ctoks k ON k.tenant_id = c.tenant_id AND k.file_path = c.file_path
  JOIN gnodes n ON n.tenant_id = c.tenant_id AND n.symbol_name = k.callee
  WHERE c.symbol_name <> n.symbol_name
),
callees AS (
  SELECT src_id AS node_id,
         array_to_string(list_sort(list_distinct(list(callee_name))), '|')
           AS callees
  FROM calls GROUP BY src_id
),
callers AS (
  SELECT dst_id AS node_id,
         array_to_string(list_sort(list_distinct(list(caller_name))), '|')
           AS callers
  FROM calls GROUP BY dst_id
)
SELECT g.node_id, g.symbol_name, callers.callers, callees.callees
FROM gnodes g
LEFT JOIN callees USING (node_id)
LEFT JOIN callers USING (node_id)
WHERE g.tenant_id = 'src0'
"""


def lsp_enrichment() -> str:
    """§2.9 LSP payload fields from the symbol graph (lsp_payload.rs):
    references = distinct call-site files (caller symbol differs from the
    target), sorted, capped at 20 with the uncapped count."""
    return f"""
WITH {_CODE_DOCS_CTE},
calls AS (
  SELECT DISTINCT n.node_id, k.file_path AS ref_file
  FROM ctoks k
  JOIN gnodes n ON n.tenant_id = k.tenant_id AND n.symbol_name = k.callee
  JOIN syms c ON c.tenant_id = k.tenant_id AND c.file_path = k.file_path
             AND c.symbol_name <> n.symbol_name
),
refs AS (
  SELECT node_id,
         array_to_string(list_sort(list_distinct(list(ref_file)))[1:20], '|')
           AS lsp_references,
         CAST(count(DISTINCT ref_file) AS BIGINT) AS lsp_references_count
  FROM calls GROUP BY node_id
)
SELECT g.node_id, g.tenant_id, g.symbol_name, g.file_path,
       'success' AS lsp_enrichment_status,
       g.file_path AS lsp_definition_file,
       'def ' || g.symbol_name || '()' AS lsp_type_signature,
       'function' AS lsp_type_kind,
       refs.lsp_references, refs.lsp_references_count
FROM gnodes g LEFT JOIN refs USING (node_id)
WHERE g.tenant_id = 'src0'
"""


def scope_resolution() -> str:
    """R18: longest-prefix watch-folder lookup; NULL for no match."""
    return """
WITH srcs AS (SELECT DISTINCT source FROM documents),
wf AS (
  SELECT '/ws/' || source AS folder, source AS tenant_id FROM srcs
  UNION ALL
  SELECT '/ws/' || source || '/nested', source || '.nested' FROM srcs
),
probes AS (
  SELECT unnest(['/ws/src0/sub/a', '/ws/src0/nested/x', '/ws/src1',
                 '/no/match']) AS cwd
),
m AS (
  SELECT p.cwd, w.tenant_id,
         row_number() OVER (
           PARTITION BY p.cwd ORDER BY length(w.folder) DESC, w.folder ASC
         ) AS rn
  FROM probes p JOIN wf w
    ON (p.cwd = w.folder OR starts_with(p.cwd || '/', w.folder || '/'))
)
SELECT p.cwd, m.tenant_id
FROM probes p LEFT JOIN (SELECT cwd, tenant_id FROM m WHERE rn = 1) m
  USING (cwd)
"""


def mmr_tag_selection(
    n_cand: int = 30, query_vec_id: int = 0, max_tags: int = 8
) -> str:
    """A9 greedy MMR (tag_selector.rs:98-133) unrolled to max_tags rounds:
    each round picks argmax of λ·rel − (1−λ)·max_sim_to_selected with the
    ≤0.80 inter-sim gate; ties resolve to the lowest candidate id (the
    reference scans candidates in order with strict >). (1−λ) is written
    as 1.0 − 0.7 so both engines carry the identical binary double."""
    lam = "CAST(0.7 AS DOUBLE)"
    oml = "(CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
    cutoff = "CAST(0.80 AS DOUBLE)"
    cos_cs = duckdb_cosine_sql("c.emb", "s.emb")
    rel_cos = duckdb_cosine_sql("e.embedding", "q.qe")
    parts = [
        f"""cand AS MATERIALIZED (
  SELECT e.vec_id AS idx, 'v' || CAST(e.vec_id AS VARCHAR) AS tag,
         {rel_cos} AS rel, e.embedding AS emb
  FROM embeddings e CROSS JOIN
       (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}) q
  WHERE e.vec_id < {n_cand}
)""",
        f"""p1 AS MATERIALIZED (
  SELECT idx, tag, {lam} * rel AS mmr, emb FROM cand
  ORDER BY mmr DESC, idx ASC LIMIT 1
)""",
    ]
    sel_un = "SELECT idx, emb FROM p1"
    for i in range(2, max_tags + 1):
        parts.append(f"s{i - 1} AS MATERIALIZED ({sel_un})")
        parts.append(
            f"""m{i} AS (
  SELECT c.idx, c.tag, c.rel, c.emb, max({cos_cs}) AS ms
  FROM cand c CROSS JOIN s{i - 1} s
  WHERE c.idx NOT IN (SELECT idx FROM s{i - 1})
  GROUP BY c.idx, c.tag, c.rel, c.emb
)"""
        )
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT idx, tag, {lam} * rel - {oml} * ms AS mmr, emb FROM m{i}
  WHERE ms <= {cutoff}
  ORDER BY mmr DESC, idx ASC LIMIT 1
)"""
        )
        sel_un += f" UNION ALL SELECT idx, emb FROM p{i}"
    finals = "\nUNION ALL ".join(
        f"SELECT {i} AS pick, tag, round(mmr, 6) AS mmr FROM p{i}"
        for i in range(1, max_tags + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals


def fallback_search(pattern: str = "dup", limit: int = 10) -> str:
    """R16: 3·limit scroll by id → substring match → fixed 0.5 score."""
    return f"""
WITH scroll AS (SELECT * FROM documents ORDER BY doc_id ASC LIMIT {3 * limit})
SELECT doc_id, CAST(0.5 AS DOUBLE) AS score,
       'fallback' AS search_type, 'uncertain' AS status
FROM scroll WHERE instr(lower(text), '{pattern}') > 0
ORDER BY doc_id ASC LIMIT {limit}
"""


def rules_dedup_gate() -> str:
    """R21: incoming rules flagged duplicate when trimmed content exists
    among the first 1000 stored rules; the incoming batch mixes verbatim
    re-submissions (caught) with edited content (passes)."""
    return """
WITH stored AS (
  SELECT DISTINCT trim(text) AS t FROM (
    SELECT text FROM documents ORDER BY doc_id ASC LIMIT 1000
  )
),
incoming AS (
  SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, trim('v2 ' || text) AS t
  FROM documents WHERE doc_id % 7 = 5
)
SELECT d.doc_id, (s.t IS NOT NULL) AS is_duplicate
FROM incoming d LEFT JOIN stored s USING (t)
"""


def graph_expansion_fusion(n_seeds: int = 10, per_seed: int = 5) -> str:
    """R11 fusion algebra (graph_fusion.rs:165-244) over the acyclic
    co-occurrence graph: originals α·(score + 0.1·bonus_count), expanded
    (1−α)·proximity with first-candidate-wins dedup, ≤5/seed by (depth,
    symbol_name)."""
    return f"""
WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS MATERIALIZED (
  SELECT a.pk AS src, b.pk AS dst, count(*) AS weight
  FROM li a JOIN li b USING (ok) WHERE a.pk < b.pk GROUP BY a.pk, b.pk
),
deg AS (
  SELECT pk, sum(w) AS w FROM (
    SELECT src AS pk, weight AS w FROM e
    UNION ALL SELECT dst AS pk, weight AS w FROM e
  ) GROUP BY pk
),
mx AS (SELECT CAST(max(w) AS DOUBLE) AS mw FROM deg),
seeds AS MATERIALIZED (
  SELECT pk, CAST(w AS DOUBLE) AS w,
         row_number() OVER (ORDER BY w DESC, pk ASC) AS cidx
  FROM deg ORDER BY w DESC, pk ASC LIMIT {n_seeds}
),
h1 AS (SELECT s.pk AS seed, e.dst AS node, 1 AS depth FROM seeds s JOIN e ON e.src = s.pk),
h2 AS (SELECT h1.seed, e.dst AS node, 2 AS depth FROM h1 JOIN e ON e.src = h1.node),
reach AS (
  SELECT seed, node, min(depth) AS depth
  FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2) GROUP BY seed, node
),
f5 AS MATERIALIZED (
  SELECT r.seed, r.node, r.depth, s.cidx
  FROM (
    SELECT seed, node, depth,
           row_number() OVER (
             PARTITION BY seed ORDER BY depth ASC, CAST(node AS VARCHAR) ASC
           ) AS rn
    FROM reach
  ) r JOIN seeds s ON s.pk = r.seed
  WHERE r.rn <= {per_seed}
),
bonus AS (
  SELECT node AS pk, count(*) AS nb FROM f5
  WHERE node IN (SELECT pk FROM seeds) GROUP BY node
),
originals AS (
  SELECT s.pk,
         CAST(0.7 AS DOUBLE)
           * (s.w / mx.mw + CAST(0.1 AS DOUBLE) * coalesce(b.nb, 0)) AS score,
         'hybrid' AS search_type
  FROM seeds s CROSS JOIN mx LEFT JOIN bonus b ON b.pk = s.pk
),
expanded AS (
  SELECT pk, score, 'graph' AS search_type FROM (
    SELECT node AS pk,
           (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
             * (CASE WHEN depth = 1 THEN CAST(0.8 AS DOUBLE)
                     ELSE CAST(0.5 AS DOUBLE) END) AS score,
           row_number() OVER (PARTITION BY node ORDER BY cidx ASC) AS pick
    FROM f5 WHERE node NOT IN (SELECT pk FROM seeds)
  ) WHERE pick = 1
),
allr AS (
  SELECT pk, score, search_type FROM originals
  UNION ALL SELECT pk, score, search_type FROM expanded
)
SELECT substr(sha256('g0|f|' || CAST(pk AS VARCHAR) || '|function'), 1, 16) AS id,
       round(score, 6) AS score, search_type
FROM allr
"""


def grouping_jaccard() -> str:
    return """
WITH sp AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
sizes AS (SELECT sk, count(*) AS n FROM sp GROUP BY sk),
inter AS (
  SELECT a.sk AS id_a, b.sk AS id_b, count(*) AS inter
  FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk < b.sk
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.sk = id_a
JOIN sizes sb ON sb.sk = id_b
"""


def queue_dequeue_order(limit: int = 100) -> str:
    """S2 parity: priority-DESC dequeue with FIFO tiebreak and age
    promotion (+1 after 300s, +2 after 900s of queue age —
    dequeue.rs:18-62). Priority derives from event_type; age is measured
    against the newest event (the 'now' of the snapshot)."""
    return f"""
WITH pe AS (
  SELECT event_id, event_type, epoch_ns(ts) AS ts_ns,
         CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 2
              WHEN 'signup' THEN 1 ELSE 0 END AS priority,
         (SELECT max(epoch_ns(ts)) FROM events) - epoch_ns(ts) AS age_ns
  FROM events
),
eff AS (
  SELECT event_id, event_type, priority,
         priority + (CASE WHEN age_ns > 900000000000 THEN 2
                          WHEN age_ns > 300000000000 THEN 1 ELSE 0 END)
           AS effective,
         ts_ns
  FROM pe
)
SELECT event_id, event_type, priority, effective
FROM eff ORDER BY effective DESC, ts_ns ASC, event_id ASC LIMIT {limit}
"""


def scd2_history() -> str:
    """Oracle for temporal.scd2_history: consecutive-duplicate collapse
    via lag, interval close via lead, same (ts, event_id) tiebreak."""
    return """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
c AS (
  SELECT user_id, event_type, ts, event_id FROM o
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM c
"""


def heavy_hitters(k: int = 10) -> str:
    """Oracle for sketches.heavy_hitters: the exact > n/k frequency
    filter the MG-candidate + exact-verify pipeline must reproduce.
    NULL keys excluded from both the groups and the n denominator,
    matching the operator (ADVICE r7 #4)."""
    return f"""
SELECT CAST(user_id AS VARCHAR) AS user_id, count(*) AS cnt
FROM events
WHERE user_id IS NOT NULL
GROUP BY 1
HAVING count(*) * {k} > (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
"""


def weighted_sample(k: int = 100, salt: str = "ws|") -> str:
    """Oracle for curation.weighted_sample over documents weighted by
    n_chars: identical Efraimidis-Spirakis keys from the shared md5
    hash, top-k by (key desc, doc_id asc)."""
    h = duckdb_md5_hash64_sql("CAST(doc_id AS VARCHAR)", salt=salt)
    return f"""
WITH w AS (
  SELECT doc_id, n_chars,
         ln((({h} % 1000000) + 0.5) / 1000000.0) / n_chars AS sample_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, round(sample_key, 6) AS sample_key
FROM w
ORDER BY w.sample_key DESC, doc_id ASC
LIMIT {k}
"""


def hourly_anomalies(z_thresh: float = 2.0) -> str:
    """Oracle for temporal.hourly_anomalies: per-type hourly counts,
    population-stddev z-scores, |z| >= threshold."""
    return f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT *, avg(n_events) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(n_events) OVER (PARTITION BY event_type) AS sd
  FROM h
)
SELECT event_type, hour, n_events,
       round((n_events - mu) / sd, 6) AS zscore
FROM s
WHERE sd > 0 AND abs((n_events - mu) / sd) >= {z_thresh}
"""


def value_quantiles() -> str:
    """Oracle for temporal.value_quantiles: type-7 linear-interpolation
    percentiles (quantile_cont == Spark percentile)."""
    return """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS q5,
       round(quantile_cont(value, 0.9), 6) AS q9,
       round(quantile_cont(value, 0.99), 6) AS q99
FROM events GROUP BY 1
"""


def salted_join_hot_key() -> str:
    """Oracle for skew.salted_join: the PLAIN join — the salt is a
    physical scattering device and must be invisible in the result."""
    return """
SELECT e.event_id, e.event_type, round(e.value, 6) AS value, d.type_n
FROM events e
JOIN (SELECT event_type, count(*) AS type_n FROM events GROUP BY 1) d
  USING (event_type)
"""


def topk_per_group(k: int = 3) -> str:
    """Oracle for operators/ranking.topk_per_group: row_number rank-limit
    per group with the same (value DESC, event_id ASC) deterministic
    order — what Spark compiles to a two-phase WindowGroupLimit."""
    return f"""
SELECT event_id, event_type, round(value, 6) AS value, rnk
FROM (
  SELECT event_id, event_type, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY value DESC, event_id ASC
         ) AS rnk
  FROM events
) WHERE rnk <= {k}
"""


def histogram_quantiles(width: float = 5.0) -> str:
    """Oracle for operators/sketches.histogram_quantiles: the fixed-width
    histogram estimate replayed exactly — floor-bucket counts, cumulative
    sum ordered by bucket, ceil(p*n) target rank, linear interpolation
    inside the covering bucket. All arithmetic integer-derived except the
    final interpolation (same IEEE doubles both engines)."""
    est = (
        "round(min(CASE WHEN cum >= greatest(1, CAST(ceil({p} * n) AS BIGINT)) "
        "AND cum - cnt < greatest(1, CAST(ceil({p} * n) AS BIGINT)) "
        "THEN bucket * {w} + {w} * (greatest(1, CAST(ceil({p} * n) AS BIGINT)) "
        "- (cum - cnt)) / cnt END), 6)"
    )
    cols = ",\n       ".join(
        est.format(p=p, w=width) + f" AS q{str(p).replace('0.', '')}"
        for p in (0.5, 0.9, 0.99)
    )
    return f"""
WITH hist AS (
  SELECT event_type,
         CAST(floor(value / {width}) AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type, {cols}
FROM cum GROUP BY 1
"""


def asof_join() -> str:
    """Oracle for operators/temporal.asof_join: LATERAL top-1 backward
    match with (ts DESC, event_id DESC) tiebreak — the ASOF JOIN
    semantics spelled out so the tie rule is pinned on both engines."""
    return """
SELECT l.event_id, l.user_id, l.ts,
       r.asof_ts, r.asof_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
LEFT JOIN LATERAL (
  SELECT rr.ts AS asof_ts, rr.event_id AS asof_event_id
  FROM events rr
  WHERE rr.user_id = l.user_id AND rr.event_type = 'signup'
    AND rr.ts <= l.ts
  ORDER BY rr.ts DESC, rr.event_id DESC
  LIMIT 1
) r ON TRUE
"""


def decayed_popularity(half_life_hours: float = 24.0) -> str:
    """Oracle for temporal.decayed_popularity: same max-ts reference,
    same 0.5^(age/h) curve, summed per key and rounded."""
    return f"""
WITH mx AS (SELECT max(ts) AS T FROM events)
SELECT event_type,
       round(sum(pow(0.5, (epoch(mx.T) - epoch(ts)) / 3600.0
                          / {half_life_hours})), 6) AS decayed_count,
       count(*) AS raw_count
FROM events, mx GROUP BY event_type
"""


def last_touch_attribution() -> str:
    """Oracle for temporal.last_touch_attribution: LATERAL top-1
    backward non-purchase touch per purchase, (ts DESC, event_id DESC)
    tiebreak — the asof_join contract with a filtered right side."""
    return """
SELECT l.event_id, l.user_id, l.ts,
       r.touch_ts, r.touch_event_id, r.touch_event_type
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
LEFT JOIN LATERAL (
  SELECT rr.ts AS touch_ts, rr.event_id AS touch_event_id,
         rr.event_type AS touch_event_type
  FROM events rr
  WHERE rr.user_id = l.user_id AND rr.event_type <> 'purchase'
    AND rr.ts <= l.ts
  ORDER BY rr.ts DESC, rr.event_id DESC
  LIMIT 1
) r ON TRUE
"""


def events_multires_rollup() -> str:
    """Oracle for operators/temporal.multires_rollup: ROLLUP grouping
    sets with GROUPING_ID, day-trunc cast back to TIMESTAMP (DuckDB's
    day-trunc yields DATE; Spark's stays TIMESTAMP)."""
    return """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       date_trunc('hour', ts) AS hour,
       GROUPING_ID(date_trunc('day', ts), date_trunc('hour', ts)) AS grp,
       count(*) AS n_events,
       round(sum("value"), 6) AS sum_value
FROM events
GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
"""


def range_join_busy_hours() -> str:
    """Oracle for temporal.range_join over the 5 busiest error hours:
    the plain inequality join DuckDB can afford at oracle scale."""
    return """
WITH busy AS (
  SELECT date_trunc('hour', ts) AS ws, count(*) AS c
  FROM events WHERE event_type = 'error'
  GROUP BY 1 ORDER BY c DESC, ws ASC LIMIT 5
)
SELECT e.event_id, b.ws AS window_start, e.event_type
FROM events e JOIN busy b
  ON e.ts >= b.ws
 AND e.ts <= b.ws + INTERVAL 59 MINUTE + INTERVAL 59 SECOND
"""


def hll_distinct_users(p: int = 8) -> str:
    """Oracle for sketches.hll_estimate over events.user_id: identical
    md5-derived registers (60-bit hash, 60-p-bit rank word, exact
    binary-string rank), identical ordered cumulative float sum."""
    m = 1 << p
    word_bits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    amm = repr(alpha * m * m)
    h = duckdb_md5_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT (v % {m}) AS bucket, v // {m} AS w
  FROM (SELECT {h} AS v FROM events)
),
r AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN {word_bits + 1}
              ELSE {word_bits + 1} - length(printf('%b', w)) END AS rho
  FROM h
),
regs AS (SELECT bucket, max(rho) AS register FROM r GROUP BY bucket),
run AS (
  SELECT register,
         sum(pow(2.0, -register)) OVER (ORDER BY bucket) AS s_run,
         count(*) OVER () AS n_present
  FROM regs
),
agg AS (SELECT max(s_run) AS s_present, max(n_present) AS n_present FROM run),
ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
SELECT {m} AS m,
       CAST(agg.n_present AS INT) AS n_nonzero,
       round(CASE WHEN ({amm} / (s_present + {m} - agg.n_present)) <= {2.5 * m}
                   AND ({m} - agg.n_present) > 0
                  THEN {float(m)} * ln({float(m)} / ({m} - agg.n_present))
                  ELSE {amm} / (s_present + {m} - agg.n_present) END,
             6) AS hll_estimate,
       ex.exact_distinct
FROM agg, ex
"""


def hll_users_by_type(p: int = 8) -> str:
    """Oracle for sketches.hll_estimate_by_group over events
    (user_id grouped by event_type): per-group md5 registers, per-group
    bucket-ordered cumulative float sum, identical correction branch."""
    m = 1 << p
    word_bits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    amm = repr(alpha * m * m)
    h = duckdb_md5_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT event_type, (v % {m}) AS bucket, v // {m} AS w
  FROM (SELECT event_type, {h} AS v FROM events)
),
r AS (
  SELECT event_type, bucket,
         CASE WHEN w = 0 THEN {word_bits + 1}
              ELSE {word_bits + 1} - length(printf('%b', w)) END AS rho
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(rho) AS register
  FROM r GROUP BY event_type, bucket
),
run AS (
  SELECT event_type,
         sum(pow(2.0, -register))
           OVER (PARTITION BY event_type ORDER BY bucket) AS s_run
  FROM regs
),
agg AS (
  SELECT event_type, max(s_run) AS s_present, count(*) AS n_present
  FROM run GROUP BY event_type
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT agg.event_type, {m} AS m,
       CAST(agg.n_present AS INT) AS n_nonzero,
       round(CASE WHEN ({amm} / (s_present + {m} - agg.n_present)) <= {2.5 * m}
                   AND ({m} - agg.n_present) > 0
                  THEN {float(m)} * ln({float(m)} / ({m} - agg.n_present))
                  ELSE {amm} / (s_present + {m} - agg.n_present) END,
             6) AS hll_estimate,
       ex.exact_distinct
FROM agg JOIN ex ON ex.event_type = agg.event_type
"""


def kmv_distinct_users(k: int = 64) -> str:
    """Oracle for sketches.kmv_distinct_estimate over events.user_id:
    exact integer k-th-smallest md5 hash, one identical float division."""
    h = duckdb_md5_hash64_sql("CAST(key AS VARCHAR)")
    return f"""
WITH dk AS (SELECT DISTINCT user_id AS key FROM events),
hs AS (SELECT {h} AS h FROM dk),
topk AS (SELECT h FROM hs ORDER BY h LIMIT {k}),
kth AS (SELECT max(h) AS kth_hash, count(*) AS nk FROM topk),
ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
SELECT {k} AS k, kth_hash,
       round({float(k - 1)} / (CAST(kth_hash AS DOUBLE) / {float(1 << 60)}), 6)
         AS kmv_estimate,
       exact_distinct
FROM kth, ex WHERE nk = {k}
"""


def cms_event_type_freqs(d: int = 4, w: int = 256) -> str:
    """Oracle for sketches.cms_point_estimates over events.event_type:
    identical md5-salted counter matrix, min over rows, exact counts."""
    h = (
        "CAST(concat('0x', substr(md5('cms' || j || '|' || key), 1, 15))"
        " AS BIGINT)"
    )
    return f"""
WITH src AS (SELECT event_type AS key FROM events),
hs AS (
  SELECT j, {h} % {w} AS bucket
  FROM src, LATERAL unnest(generate_series(0, {d - 1})) AS t(j)
),
counters AS (SELECT j, bucket, count(*) AS cnt FROM hs GROUP BY 1, 2),
probes AS (SELECT DISTINCT event_type AS key FROM events),
ph AS (
  SELECT key, j, {h} % {w} AS bucket
  FROM probes, LATERAL unnest(generate_series(0, {d - 1})) AS t(j)
),
est AS (
  SELECT ph.key, min(coalesce(c.cnt, 0)) AS cms_estimate
  FROM ph LEFT JOIN counters c ON c.j = ph.j AND c.bucket = ph.bucket
  GROUP BY ph.key
),
ex AS (SELECT event_type AS key, count(*) AS exact_count FROM events GROUP BY 1)
SELECT est.key, est.cms_estimate, coalesce(ex.exact_count, 0) AS exact_count
FROM est LEFT JOIN ex USING (key)
"""


def bloom_user_membership(m: int = 1024, k: int = 4) -> str:
    """Oracle for sketches.bloom_membership over events.user_id:
    identical md5-salted bit positions, all-k membership test, density
    false-positive estimate with the same left-associated
    multiplications."""
    h = (
        "CAST(concat('0x', substr(md5('bloom' || j || '|' || key), 1, 15))"
        " AS BIGINT)"
    )
    dens = f"(CAST(n_bits_set AS DOUBLE) / {float(m)})"
    fp = " * ".join([dens] * k)
    return f"""
WITH src AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
bits AS MATERIALIZED (
  SELECT DISTINCT {h} % {m} AS bit
  FROM src, LATERAL unnest(generate_series(0, {k - 1})) AS t(j)
),
known AS (
  SELECT key FROM (SELECT DISTINCT key FROM src) ORDER BY key LIMIT 10
),
probes AS (
  SELECT key FROM known
  UNION ALL
  SELECT 'ghost' || i FROM generate_series(0, 9) s(i)
),
ph AS (
  SELECT DISTINCT key, {h} % {m} AS bit
  FROM probes, LATERAL unnest(generate_series(0, {k - 1})) AS t(j)
),
hits AS (
  SELECT ph.key,
         count(*) AS n_probe_bits,
         sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_set
  FROM ph LEFT JOIN bits b USING (bit)
  GROUP BY ph.key
),
ex AS (SELECT DISTINCT key, TRUE AS present_exact FROM src),
nb AS (SELECT count(*) AS n_bits_set FROM bits)
SELECT h.key,
       h.n_set = h.n_probe_bits AS maybe_present,
       coalesce(ex.present_exact, FALSE) AS present_exact,
       nb.n_bits_set,
       round({fp}, 6) AS fp_estimate
FROM hits h LEFT JOIN ex USING (key), nb
"""


def funnel_conversion(
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> str:
    """Oracle for sessions.funnel: chained min-frontier CTEs, strict
    event-time ordering between stages."""
    ctes = []
    selects = []
    for idx, st in enumerate(stages):
        name = f"s{idx + 1}"
        if idx == 0:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t FROM events"
                f" WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            prev = f"s{idx}"
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t"
                f" FROM events e JOIN {prev} p ON e.user_id = p.user_id"
                f" WHERE e.event_type = '{st}' AND e.ts > p.t"
                f" GROUP BY e.user_id)"
            )
        selects.append(
            f"SELECT {idx + 1} AS stage_index, '{st}' AS stage,"
            f" (SELECT count(*) FROM {name}) AS n_users"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention() -> str:
    """Oracle for sessions.cohort_retention: first-event-day cohorts ×
    active-day offsets (day-trunc cast to TIMESTAMP for Spark parity)."""
    return """
WITH first AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS day_offset,
       count(*) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


def events_hourly_rollup() -> str:
    """Oracle for streaming/windows.windowed_rollup in batch mode:
    tumbling 1-hour event-time windows == date_trunc buckets (UTC
    session, hour-aligned windows)."""
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       min(user_id) AS u_lo,
       max(user_id) AS u_hi,
       round(sum("value"), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_rollup() -> str:
    """Oracle for streaming/windows.sliding_rollup (2 h windows, 1 h
    hop): Spark's F.window(ts, len, slide) assigns each event to the
    len/slide epoch-aligned windows whose start is date_trunc(slide)
    minus k·slide for k = 0..len/slide-1 — replayed here as an explicit
    unnest of the two offsets (every event is in exactly both, since
    ts - date_trunc('hour', ts) < 1 h < 2 h)."""
    return """
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum("value"), 6) AS sum_value
FROM (
  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
         event_type, "value"
  FROM events CROSS JOIN unnest([0, 1]) AS t(k)
)
GROUP BY 1, 2, 3
"""


def bloom_pruned_join() -> str:
    """Oracle for sketches.bloom_pruned_join's driver query: the PLAIN
    join — the operator's Bloom pruning is lossless (no false
    negatives; the join removes false positives), so plain-join
    equality IS the correctness contract."""
    return """
SELECT d.doc_id, d.source, d.n_chars,
       CAST(len(regexp_extract_all(x.text, 'dup')) AS INT) AS n_dup
FROM documents d
JOIN documents x ON d.doc_id = x.doc_id
WHERE len(regexp_extract_all(x.text, 'dup')) > 0
ORDER BY d.doc_id
"""


def knn_graph(k: int = 3, cap: int = 1000) -> str:
    """Oracle for ann.knn_graph in exact (brute) mode over the capped
    slice (vec_id < cap, mirroring the query's KNN_GRAPH_CAP): the
    all-pairs cosine top-k per vector, ties broken vec_id ASC — the
    same SQL shape as ann_bruteforce_topk with every vector as a
    query."""
    cos = duckdb_cosine_sql("e.embedding", "q.embedding")
    return f"""
WITH emb AS (SELECT * FROM embeddings WHERE vec_id < {cap}),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id, {cos} AS score
  FROM emb e CROSS JOIN emb q
  WHERE e.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC)
           AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {k}
"""


def bottomk_sample(k: int = 5) -> str:
    """Oracle for sketches.bottomk_sample over events (group =
    event_type, value = user_id): identical salted hash, identical
    (h, value) rank order."""
    h = duckdb_md5_hash64_sql("value", salt="sample|")
    return f"""
WITH d AS (
  SELECT DISTINCT event_type AS "group", CAST(user_id AS VARCHAR) AS value
  FROM events
),
r AS (
  SELECT "group", value,
         row_number() OVER (
           PARTITION BY "group" ORDER BY {h} ASC, value ASC
         ) AS rnk
  FROM d
)
SELECT "group", CAST(rnk AS INT) AS rnk, value
FROM r WHERE rnk <= {k}
"""


def zorder_keys(bits: int = 16) -> str:
    """Oracle for layout.zorder_keys (rank mode) over events: identical
    percent_rank grids, identical per-bit Morton interleave arithmetic
    (both engines define percent_rank as (rank-1)/(n-1) with ties
    sharing a rank, and the float grid scale is the same IEEE ops)."""
    scale = float((1 << bits) - 1)
    inter = " + ".join(
        f"(((zx >> {i}) & 1) << {2 * i}) + (((zy >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
WITH g AS (
  SELECT event_id,
         CAST(floor(percent_rank() OVER (ORDER BY "value") * {scale} + 0.5) AS BIGINT) AS zx,
         CAST(floor(percent_rank() OVER (ORDER BY user_id) * {scale} + 0.5) AS BIGINT) AS zy
  FROM events
)
SELECT event_id, zx, zy, CAST({inter} AS BIGINT) AS zkey
FROM g
"""


def shard_assignment(n_shards: int = 8) -> str:
    """Oracle for curation.shard_assignment: identical keyed hash,
    modulo shard, per-shard (hash, id) position, whitespace tokens."""
    h = duckdb_md5_hash64_sql("CAST(doc_id AS VARCHAR)", salt="shard|")
    return f"""
WITH a AS (
  SELECT doc_id, {h} AS h,
         CAST({h} % {n_shards} AS INT) AS shard,
         len(list_filter(string_split_regex(text, '\\s+'),
                         t -> length(t) > 0)) AS n_tokens
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
            AS INT) AS pos_in_shard,
       CAST(n_tokens AS INT) AS n_tokens
FROM a
"""


def fairness_dequeue(n_slice: int = 60, batch: int = 10) -> str:
    """Oracle for the W7 fairness drain (streaming/fairness.py): replay
    the same queue derivation, thresholds and dequeue ORDER BY, with the
    DESC/ASC alternation unrolled — full batches flip the direction
    every round (10 >= both budgets), so round i runs DESC iff i is
    even. Each round is rank → take `batch` → anti-join remove (the
    dedup_survivors unroll pattern)."""
    n_rounds = n_slice // batch

    def order_by(desc: bool) -> str:
        pr = (
            "CASE WHEN collection = 'rules' THEN 1 "
            "WHEN collection = 'libraries' THEN 0 "
            "WHEN is_active > 0 THEN 1 ELSE 0 END"
        )
        opw = (
            "CASE WHEN op = 'delete' THEN 10 WHEN op = 'reset' THEN 8 "
            "WHEN op = 'add' THEN 5 WHEN op = 'update' THEN 4 "
            "WHEN op = 'rename' THEN 3 WHEN op = 'uplift' THEN 2 ELSE 1 END"
        )
        d = "DESC" if desc else "ASC"
        # FIFO created-order on the high-priority (DESC) pass, LIFO on
        # the anti-starvation (ASC) pass — the tiebreak direction is the
        # INVERSE of the priority direction (dequeue.rs created_at
        # {order} with order ASC on DESC passes). Op weight is ALWAYS
        # DESC regardless of pass (dequeue.rs:76-79 pins op_order).
        t = "ASC" if desc else "DESC"
        return (
            "CASE WHEN op IN ('delete','reset') THEN 1 ELSE 0 END DESC, "
            "CASE WHEN item_type = 'tenant' AND op IN ('add','scan') "
            "THEN 1 ELSE 0 END DESC, "
            "CASE WHEN now_ts - created_ts >= crit THEN 2 "
            "WHEN now_ts - created_ts >= warn THEN 1 ELSE 0 END DESC, "
            f"{pr} {d}, {opw} DESC, created_ts {t}, queue_id {t}"
        )

    parts = [
        f"""
WITH sl AS MATERIALIZED (
  SELECT event_id, event_type, user_id, ts FROM events
  ORDER BY event_id LIMIT {n_slice}
),
q0 AS MATERIALIZED (
  SELECT event_id AS queue_id,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'add'
              WHEN event_type = 'signup' THEN 'update'
              WHEN event_type = 'click' THEN 'uplift'
              ELSE 'scan' END AS op,
         CASE WHEN event_id % 17 = 0 THEN 'tenant' ELSE 'file' END
           AS item_type,
         CASE WHEN event_id % 11 = 0 THEN 'rules'
              WHEN event_id % 11 = 1 THEN 'libraries'
              ELSE 'projects' END AS collection,
         CAST(user_id % 2 AS INT) AS is_active,
         CAST(floor(epoch(ts)) AS BIGINT) AS created_ts,
         (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) + 1 FROM sl) AS now_ts,
         (SELECT greatest(1, CAST(floor(epoch(max(ts))) AS BIGINT)
                             - CAST(floor(epoch(min(ts))) AS BIGINT)) // 3 FROM sl)
           AS warn,
         (SELECT 2 * greatest(1, CAST(floor(epoch(max(ts))) AS BIGINT)
                                 - CAST(floor(epoch(min(ts))) AS BIGINT)) // 3 FROM sl)
           AS crit
  FROM sl
)"""
    ]
    for i in range(n_rounds):
        desc = i % 2 == 0
        parts.append(
            f""",
b{i} AS MATERIALIZED (
  SELECT *, row_number() OVER (ORDER BY {order_by(desc)}) - 1 AS pos
  FROM q{i} ORDER BY {order_by(desc)} LIMIT {batch}
),
q{i + 1} AS MATERIALIZED (
  SELECT q.* FROM q{i} q ANTI JOIN b{i} USING (queue_id)
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS batch_no, CAST(pos AS INT) AS pos, queue_id FROM b{i}"
        for i in range(n_rounds)
    )
    parts.append("\n" + selects)
    return "".join(parts)


def events_session_rollup(gap_minutes: int = 360) -> str:
    """Oracle for streaming/windows.session_rollup in batch mode:
    gap-closed session windows per user — split when ts - prev_ts >
    gap (STRICTLY greater; exactly-gap merges — probed against
    session_window and identical to sessionize's flag), window =
    [min ts, max ts + gap)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
),
f AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
       user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
"""


def events_debounce_last() -> str:
    return """
WITH r AS (
  SELECT date_trunc('hour', ts) AS window_start, user_id, event_type, event_id,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT window_start, user_id, event_type, event_id FROM r WHERE rn = 1
"""


def queue_stats() -> str:
    return """
SELECT event_type,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value,
       count(DISTINCT user_id) AS n_users,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM events GROUP BY event_type
"""


def mock_embeddings() -> str:
    from .functions.embedder import MOCK_DIM, duckdb_mock_embed_sql

    emb = duckdb_mock_embed_sql("text")
    return f"""
WITH v AS (SELECT doc_id, {emb} AS e FROM documents)
SELECT doc_id, i - 1 AS dim, round(e[i], 6) AS value
FROM v, LATERAL unnest(generate_series(1, {MOCK_DIM})) AS t(i)
"""


def cross_collection_rrf(query_terms: list[str], limit: int = 10) -> str:
    """R19: same query over N collections (documents partitioned by parity),
    per-collection rank, RRF k=60 across the legs."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH {_tf_df_ctes()},
coll AS (
  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS collection
  FROM documents
),
q AS (SELECT unnest([{terms}]) AS term),
scored AS (
  SELECT c.collection, tf.doc_id,
         sum(greatest(0.0, ln((nn.n - dfreq.df + 0.5) / (dfreq.df + 0.5)))
             * ({K1} * tf.tf) / (tf.tf + {K1})) AS score
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
  JOIN coll c ON c.doc_id = tf.doc_id CROSS JOIN nn
  GROUP BY c.collection, tf.doc_id
),
flt AS (SELECT * FROM scored WHERE score >= 0.15),
ranked AS (
  SELECT collection, doc_id,
         row_number() OVER (PARTITION BY collection
                            ORDER BY score DESC, doc_id ASC) - 1 AS rnk
  FROM flt
),
top AS (SELECT * FROM ranked WHERE rnk < 10),
fused AS (
  SELECT collection, doc_id, 1.0 / (60 + rnk + 1) AS score FROM top
)
SELECT collection, doc_id, round(score, 6) AS score
FROM fused ORDER BY score DESC, collection ASC, doc_id ASC LIMIT {limit}
"""


def multimodal_features(feature_dim: int = 8) -> str:
    """Oracle for the mapInPandas feature extraction: the deterministic
    fake decode is md5-derived, so SQL reproduces it bit-for-bit."""
    cols = ", ".join(
        f"CAST(CAST(concat('0x', substr(h, {4 * i + 1}, 4)) AS INT) % 10000 "
        f"AS DOUBLE) / 10000.0 AS f{i}"
        for i in range(feature_dim)
    )
    vals = ", ".join(f"({i}, f{i})" for i in range(feature_dim))
    return f"""
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         text, length(text) AS n_bytes
  FROM documents
),
h AS (SELECT asset_id, modality, n_bytes, md5(modality || '|' || text) AS h FROM a),
f AS (SELECT asset_id, modality, n_bytes, {cols} FROM h)
SELECT asset_id, modality, n_bytes, dim, round(value, 6) AS value
FROM f, LATERAL (VALUES {vals}) AS t(dim, value)
"""


def image_search(query_asset: int = 0, k: int = 10, feature_dim: int = 8) -> str:
    """R20: dense cosine search over the image collection's (fake-)CLIP
    features; query = asset 0's feature vector."""
    cols = ", ".join(
        f"CAST(CAST(concat('0x', substr(h, {4 * i + 1}, 4)) AS INT) % 10000 "
        f"AS DOUBLE) / 10000.0"
        for i in range(feature_dim)
    )
    cos = duckdb_cosine_sql("f.fv", "q.fv")
    return f"""
WITH a AS (
  SELECT doc_id AS asset_id, text
  FROM documents WHERE doc_id % 3 = 0
),
f AS (
  SELECT asset_id, [{cols}] AS fv
  FROM (SELECT asset_id, md5('image' || '|' || text) AS h FROM a)
),
q AS (SELECT fv FROM f WHERE asset_id = {query_asset}),
scored AS (
  SELECT f.asset_id, {cos} AS score FROM f CROSS JOIN q
  WHERE f.asset_id <> {query_asset}
)
SELECT asset_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, asset_id ASC LIMIT {k}
"""


def dataset_split(
    train: float = 0.8, val: float = 0.1, buckets: int = 1000
) -> str:
    """Training-split assignment (curation.split_assign): keyed-hash
    bucket of doc_id -> train/val/test, aggregated per (split, source).
    The hash is the shared md5-prefix 60-bit primitive, so the bucket is
    bit-identical across engines."""
    h = duckdb_md5_hash64_sql("CAST(doc_id AS VARCHAR)", salt="split|")
    tcut = int(round(train * buckets))
    vcut = int(round((train + val) * buckets))
    return f"""
WITH s AS (
  SELECT source, ({h}) % {buckets} AS bucket, n_chars FROM documents
),
t AS (
  SELECT CASE WHEN bucket < {tcut} THEN 'train'
              WHEN bucket < {vcut} THEN 'val'
              ELSE 'test' END AS split,
         source, n_chars
  FROM s
)
SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY 1, 2
"""


def mixture_sample(
    rates: dict[str, float], default_rate: float, buckets: int = 1000
) -> str:
    """Stratified corpus sampling (curation.stratified_sample): keyed-hash
    keep-if-bucket-below-rate per source, aggregated per source."""
    h = duckdb_md5_hash64_sql("CAST(doc_id AS VARCHAR)", salt="mix|")
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(r * buckets))}"
        for s, r in sorted(rates.items())
    )
    cut = f"CASE source {cases} ELSE {int(round(default_rate * buckets))} END"
    return f"""
WITH s AS (
  SELECT source, n_chars, ({h}) % {buckets} AS bucket FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM s WHERE bucket < {cut}
GROUP BY source
"""


def decontamination(
    n: int = 13, min_shared: int = 1, df_cap: int = 100
) -> str:
    """Benchmark decontamination (curation.decontaminate): training docs
    (source <> 'src1') sharing >= min_shared distinct word n-grams with
    the eval set (source = 'src1'); grams with corpus df > df_cap are
    boilerplate and never join. n=13 is GPT-3's published collision
    width (Brown et al. 2020, appendix C)."""
    gram_i = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return f"""
WITH wd AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS w
  FROM documents
),
gs AS (
  SELECT doc_id, source,
         CASE WHEN len(w) >= {n}
              THEN list_distinct(list_transform(
                     generate_series(1, len(w) - {n - 1}), i -> {gram_i}))
              ELSE [] END AS grams
  FROM wd
),
g AS (SELECT doc_id, source,
             unnest(list_transform(grams,
               x -> {duckdb_md5_hash64_sql('x')})) AS gram
      FROM gs),
dfq AS (
  SELECT gram FROM (SELECT gram, count(*) AS df FROM g GROUP BY gram)
  WHERE df <= {df_cap}
),
tg AS (SELECT doc_id, gram FROM g WHERE source <> 'src1'),
eg AS (SELECT doc_id AS eval_doc_id, gram FROM g WHERE source = 'src1'),
hits AS (
  SELECT t.doc_id,
         count(DISTINCT t.gram) AS n_shared_grams,
         count(DISTINCT e.eval_doc_id) AS n_eval_docs
  FROM tg t JOIN dfq USING (gram) JOIN eg e USING (gram)
  GROUP BY 1
  HAVING count(DISTINCT t.gram) >= {min_shared}
)
SELECT doc_id, CAST(n_shared_grams AS BIGINT) AS n_shared_grams,
       CAST(n_eval_docs AS BIGINT) AS n_eval_docs
FROM hits
"""


def list_summary() -> str:
    """Oracle for api.list_files(mode='summary'): per-tenant file/chunk
    rollup over the derived chunk store (tenant = source, one file per
    document)."""
    return f"""
WITH {duckdb_chunk_text_sql()},
j AS (
  SELECT c.doc_id, d.source
  FROM chunks c JOIN documents d USING (doc_id)
)
SELECT source AS tenant_id,
       count(DISTINCT doc_id) AS n_files,
       count(*) AS n_chunks
FROM j GROUP BY source
"""


def list_tree() -> str:
    """Oracle for api.list_files(mode='tree'): per-directory-prefix file
    counts at every depth over the derived path scheme."""
    return f"""
WITH {duckdb_chunk_text_sql()},
files AS (
  SELECT DISTINCT 'src/' || d.source || '/doc_' || c.doc_id || '.txt' AS p
  FROM chunks c JOIN documents d USING (doc_id)
),
parts AS (SELECT p, string_split(p, '/') AS seg FROM files),
pref AS (
  SELECT array_to_string(seg[1:i], '/') AS dir_path
  FROM parts, LATERAL unnest(generate_series(1, len(seg) - 1)) AS t(i)
  WHERE len(seg) > 1
)
SELECT dir_path, count(*) AS n_files,
       len(string_split(dir_path, '/')) AS depth
FROM pref GROUP BY dir_path
"""


def winnowing_fingerprints(k: int = 5, window: int = 4) -> str:
    """Oracle for textstats.winnowing_fingerprints: same packed
    (hash, pos) int64 key, same forward window min, same full-window
    start filter, pure integer decode."""
    h = duckdb_md5_hash64_sql(f"substr(text, i, {k})")
    return f"""
WITH d AS (
  SELECT doc_id, text, greatest(length(text) - {k - 1}, 0) AS ng
  FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         ((({h}) % 4294967296) + 4294967296) % 4294967296 AS h
  FROM d, LATERAL unnest(generate_series(1, ng)) AS t(i)
  WHERE ng > 0
),
k2 AS (
  SELECT doc_id, pos, h * 1048576 + pos AS key,
         count(*) OVER (PARTITION BY doc_id) AS n_g
  FROM g
),
w AS (
  SELECT doc_id, pos, n_g,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
           AS wkey
  FROM k2
)
SELECT DISTINCT doc_id, wkey % 1048576 AS pos, wkey // 1048576 AS fp
FROM w WHERE pos <= greatest(n_g - {window - 1}, 1)
"""


def doc_fingerprint() -> str:
    return """
SELECT doc_id,
       substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fp
FROM documents
"""


def gopher_repetition() -> str:
    """Gopher A1.2 repetition stats — mirrors textstats.gopher_repetition:
    word n-grams (n=2..5) via list_transform, top-gram pick with the
    (count DESC, gram ASC) tiebreak, simplified overlap-unaware duplicate-
    5-gram character accounting, pass flag over the ROUNDED fractions."""
    return """
WITH tokd AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
base AS (
  SELECT doc_id, n_chars, len(w) AS n_words,
         len(list_distinct(w)) AS n_distinct, w
  FROM tokd
),
grams AS (
  SELECT doc_id, n_chars, n,
         unnest(CASE WHEN len(w) >= n
                THEN list_transform(generate_series(1, len(w) - n + 1),
                     i -> array_to_string(list_slice(w, i, i + n - 1), ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM base, (SELECT unnest([2, 3, 4, 5]) AS n) ns
),
cnts AS (
  SELECT doc_id, n_chars, n, gram, count(*) AS cnt
  FROM grams GROUP BY ALL
),
top AS (
  SELECT doc_id, n, round(cnt * length(gram) / greatest(n_chars, 1), 6)
           AS top_frac
  FROM cnts
  QUALIFY row_number() OVER (PARTITION BY doc_id, n
                             ORDER BY cnt DESC, gram ASC) = 1
),
dup5 AS (
  SELECT doc_id,
         round(least(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram)
                         ELSE 0 END) / greatest(any_value(n_chars), 1),
                     1.0), 6) AS dup_frac
  FROM cnts WHERE n = 5 GROUP BY doc_id
),
j AS (
  SELECT b.doc_id,
         round((b.n_words - b.n_distinct) / greatest(b.n_words, 1), 6)
           AS dup_word_frac,
         coalesce(t2.top_frac, 0) AS top2gram_char_frac,
         coalesce(t3.top_frac, 0) AS top3gram_char_frac,
         coalesce(t4.top_frac, 0) AS top4gram_char_frac,
         coalesce(d5.dup_frac, 0) AS dup5gram_char_frac
  FROM base b
  LEFT JOIN top t2 ON t2.doc_id = b.doc_id AND t2.n = 2
  LEFT JOIN top t3 ON t3.doc_id = b.doc_id AND t3.n = 3
  LEFT JOIN top t4 ON t4.doc_id = b.doc_id AND t4.n = 4
  LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
)
SELECT doc_id, dup_word_frac, top2gram_char_frac, top3gram_char_frac,
       top4gram_char_frac, dup5gram_char_frac,
       (top2gram_char_frac <= 0.20 AND top3gram_char_frac <= 0.18
        AND top4gram_char_frac <= 0.16 AND dup5gram_char_frac <= 0.15)
         AS repetition_pass
FROM j
"""


def gopher_quality() -> str:
    """Gopher A1.1 quality rules — mirrors textstats.gopher_quality
    (same rounding before the threshold comparisons)."""
    return """
WITH tokd AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
f AS (
  SELECT doc_id,
         len(w) AS n_words,
         round(CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0)
               AS DOUBLE) / greatest(len(w), 1), 6) AS mean_word_len,
         round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
               AS DOUBLE) / greatest(len(w), 1), 6) AS symbol_word_ratio,
         round(CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]')))
               AS DOUBLE) / greatest(len(w), 1), 6) AS frac_alpha_words,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(w, s))) AS stopwords_present
  FROM tokd
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, frac_alpha_words,
       stopwords_present,
       (n_words BETWEEN 50 AND 100000) AS pass_word_count,
       (mean_word_len BETWEEN 3.0 AND 10.0) AS pass_mean_word_len,
       (symbol_word_ratio < 0.1) AS pass_symbol_ratio,
       (frac_alpha_words > 0.8) AS pass_alpha_words,
       (stopwords_present >= 2) AS pass_stopwords,
       ((n_words BETWEEN 50 AND 100000)
        AND (mean_word_len BETWEEN 3.0 AND 10.0)
        AND (symbol_word_ratio < 0.1) AND (frac_alpha_words > 0.8)
        AND (stopwords_present >= 2)) AS keep
FROM f
"""


def pii_detection() -> str:
    """PII counts + redacted fingerprint over the deterministic fixture
    augmentation — byte-identical regexes and concat to operators/pii.py
    (RE2-compatible patterns, same redaction order)."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    phone = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
    govid = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    return f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 5 = 0
       THEN ' contact user' || doc_id || '@example.com for details'
       ELSE '' END
    || CASE WHEN doc_id % 7 = 0
       THEN ' from host 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
       ELSE '' END
    || CASE WHEN doc_id % 9 = 0
       THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
    || CASE WHEN doc_id % 13 = 0
       THEN ' ref 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END AS pii_text
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(pii_text, '{email}')) AS INT) AS n_emails,
         CAST(len(regexp_extract_all(pii_text, '{ipv4}')) AS INT) AS n_ipv4s,
         CAST(len(regexp_extract_all(pii_text, '{phone}')) AS INT) AS n_phones,
         CAST(len(regexp_extract_all(pii_text, '{govid}')) AS INT) AS n_govids,
         substr(md5(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             pii_text, '{email}', '<EMAIL>', 'g'),
             '{ipv4}', '<IP>', 'g'),
             '{phone}', '<PHONE>', 'g'),
             '{govid}', '<ID>', 'g')), 1, 16) AS redacted_fp
  FROM aug
)
SELECT doc_id, n_emails, n_ipv4s, n_phones, n_govids,
       n_emails + n_ipv4s + n_phones + n_govids AS pii_total,
       redacted_fp
FROM c
"""


def quality_buckets(n_buckets: int = 3) -> str:
    """CCNet-style per-source quality tertiles — NTILE over the
    quality_score oracle's composite with the (quality DESC, doc_id ASC)
    unique ordering, mirroring curation.quality_buckets."""
    return f"""
WITH q AS (
  SELECT doc_id, quality FROM ({quality_score()}) qs
),
t AS (
  SELECT d.doc_id, d.source, q.quality,
         ntile({n_buckets}) OVER (PARTITION BY d.source
                                  ORDER BY q.quality DESC, d.doc_id ASC)
           AS tile
  FROM documents d JOIN q USING (doc_id)
)
SELECT doc_id, source, quality,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM t
"""


def curation_funnel() -> str:
    """Per-source keep/drop funnel — composes the gopher_quality,
    gopher_repetition, and pii_detection oracles as subqueries plus the
    doc_fingerprint min-doc_id canonicality rule; the quality stage drops
    the stopword gate (corpus-adapted, same as the Spark side)."""
    return f"""
WITH q AS (
  SELECT doc_id,
         (pass_word_count AND pass_mean_word_len AND pass_symbol_ratio
          AND pass_alpha_words) AS q_pass
  FROM ({gopher_quality()}) gq
),
r AS (
  SELECT doc_id, repetition_pass FROM ({gopher_repetition()}) gr
),
p AS (
  SELECT doc_id, pii_total FROM ({pii_detection()}) pd
),
fps AS (
  SELECT doc_id,
         substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16)
           AS fp
  FROM documents
),
canon AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS is_canon
  FROM fps
),
j AS (
  SELECT d.source, q.q_pass, r.repetition_pass, p.pii_total, c.is_canon
  FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id)
  JOIN p USING (doc_id) JOIN canon c USING (doc_id)
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
  CAST(sum(CASE WHEN q_pass AND repetition_pass THEN 1 ELSE 0 END)
       AS BIGINT) AS n_repetition,
  CAST(sum(CASE WHEN q_pass AND repetition_pass AND pii_total = 0
           THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_clean,
  CAST(sum(CASE WHEN q_pass AND repetition_pass AND pii_total = 0
           AND is_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM j
GROUP BY source
"""


def boilerplate_lines(min_docs: int = 3, limit: int = 100) -> str:
    """Corpus-level line-frequency boilerplate — mirrors
    dedup.boilerplate_lines over the identical code_lines derivation."""
    return f"""
WITH {duckdb_code_lines_sql()},
agg AS (
  SELECT content,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM lines GROUP BY content
)
SELECT content, n_docs, n_occurrences
FROM agg
WHERE n_docs >= {min_docs}
ORDER BY n_docs DESC, content ASC
LIMIT {limit}
"""


def mixture_plan(targets: dict[str, float]) -> str:
    """Data-mixture planning — mirrors curation.mixture_plan: per-source
    whitespace-token totals, then the closed-form downsampling-only rates
    rate_s = target_s * T / tokens_s with T = min_s(tokens_s / target_s)."""
    # CAST each share to DOUBLE: a bare 0.05 literal makes the CASE (and
    # everything dividing by it) DECIMAL, and Decimal('0.05') != 0.05
    # under the comparator's float normalization.
    case = " ".join(
        f"WHEN '{src}' THEN CAST({float(share)!r} AS DOUBLE)"
        for src, share in sorted(targets.items())
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> length(t) > 0)) AS ws
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS n_tokens
  FROM toks GROUP BY source
),
planned AS (
  SELECT source, n_docs, n_tokens,
         CASE source {case} END AS target_share,
         min(n_tokens / (CASE source {case} END)) OVER () AS t_final,
         sum(n_tokens) OVER () AS tot
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 6) AS observed_share,
       round(target_share, 6) AS target_share,
       round(least(target_share * t_final / n_tokens, 1.0), 6) AS rate
FROM planned
"""


def mixture_plan_epochs(
    targets: dict[str, float], max_epochs: float = 4.0
) -> str:
    """Oracle for curation.mixture_plan_epochs: same token aggregate and
    closed form as mixture_plan with T = min(tokens * max_epochs /
    target) and epochs uncapped below max_epochs by construction."""
    case = " ".join(
        f"WHEN '{src}' THEN CAST({float(share)!r} AS DOUBLE)"
        for src, share in sorted(targets.items())
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> length(t) > 0)) AS ws
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS n_tokens
  FROM toks GROUP BY source
),
planned AS (
  SELECT source, n_docs, n_tokens,
         CASE source {case} END AS target_share,
         min(n_tokens * CAST({float(max_epochs)!r} AS DOUBLE)
             / (CASE source {case} END)) OVER () AS t_final,
         sum(n_tokens) OVER () AS tot
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 6) AS observed_share,
       round(target_share, 6) AS target_share,
       round(target_share * t_final / n_tokens, 6) AS epochs
FROM planned
"""


def events_interval_join() -> str:
    """Oracle for streaming/joins.interval_join in batch mode: errors
    joined to same-user clicks in the preceding 24 h — a plain SQL range
    join."""
    return """
SELECT l.event_id AS error_id, l.user_id, r.event_id AS click_id
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE l.event_type = 'error' AND r.event_type = 'click'
  AND r.ts >= l.ts - INTERVAL 24 HOUR
  AND r.ts <= l.ts
"""


def dsir_logweights(target_value: str = "src0", alpha: float = 1.0) -> str:
    """Oracle for curation.dsir_logweights (DSIR, arXiv:2302.03169):
    per-doc mean log ratio of add-alpha-smoothed target vs raw unigram
    probabilities over the shared vocabulary."""
    return f"""
WITH tok AS (
  SELECT doc_id, CAST(source = '{target_value}' AS BIGINT) AS t,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            s -> length(s) > 0)) AS w
  FROM documents
),
uni AS (SELECT w, count(*) AS c_raw, sum(t) AS c_tgt FROM tok GROUP BY w),
tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v FROM uni),
r AS (
  SELECT w,
         ln((c_tgt + {alpha}) / (tot.n_tgt + {alpha} * tot.v))
       - ln((c_raw + {alpha}) / (tot.n_raw + {alpha} * tot.v)) AS lr
  FROM uni, tot
),
d AS (
  SELECT t.doc_id, count(*) AS n_tokens, avg(r.lr) AS lw
  FROM tok t JOIN r USING (w) GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, round(lw, 6) AS log_w
FROM d
"""


def bigram_logppl() -> str:
    """Oracle for textstats.bigram_logppl: add-one-smoothed conditional
    bigram LM over the corpus, p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V)."""
    return """
WITH tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
  FROM tokd, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
cnt AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY bg),
ctx AS (
  SELECT split_part(bg, ' ', 1) AS w1, sum(c_bg) AS c_ctx
  FROM cnt GROUP BY 1
),
vt AS (
  SELECT count(DISTINCT tk) AS v
  FROM (SELECT unnest(w) AS tk FROM tokd)
),
p AS (
  SELECT cnt.bg, (cnt.c_bg + 1.0) / (ctx.c_ctx + vt.v) AS pw
  FROM cnt JOIN ctx ON split_part(cnt.bg, ' ', 1) = ctx.w1, vt
),
d AS (
  SELECT b.doc_id, count(*) AS n_bigrams, -avg(ln(p.pw)) AS lp
  FROM bg b JOIN p USING (bg) GROUP BY b.doc_id
)
SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams, round(lp, 6) AS logppl
FROM d
"""


def _kn_ctes(discount: float, train_where: str = "") -> str:
    """The shared Kneser-Ney CTE chain: whitespace-bigram stream (with
    doc_id + split words), count/context/continuation/type tables over
    the TRAINING subset (`train_where` restricts it; empty = the whole
    stream), and bgt = quantized ln p_KN per seen bigram — mirrored
    token-for-token against the Spark _bigram_stream/_kn_tables/_kn_pw
    helpers."""
    d = float(discount)
    return f"""
tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg,
         w[i] AS w1, w[i + 1] AS w2
  FROM tokd, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
cnt AS (
  SELECT bg, count(*) AS c_bg,
         split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM bg {train_where} GROUP BY bg
),
ctx AS (
  SELECT w1, sum(c_bg) AS c_ctx, count(*) AS n1_fwd
  FROM cnt GROUP BY w1
),
bwd AS (SELECT w2, count(*) AS n1_bwd FROM cnt GROUP BY w2),
tot AS (SELECT count(*) AS n_types FROM cnt),
bgt AS (
  SELECT cnt.bg,
         CAST(round(ln(
           (greatest(CAST(c_bg AS DOUBLE) - {d}, 0.0) / c_ctx)
           + ((({d} * n1_fwd) / c_ctx)
              * (CAST(n1_bwd AS DOUBLE) / n_types))
         ) * 1000000) AS BIGINT) AS lq
  FROM cnt JOIN ctx USING (w1) JOIN bwd USING (w2), tot
)"""


def kn_bigram_logppl(discount: float = 0.75) -> str:
    """Oracle for textstats.kn_bigram_logppl: the shared KN chain with
    the full corpus as the training set — every scored bigram is seen,
    so the per-doc sum joins the stream straight onto bgt."""
    lp = micro6_sql("-(CAST(s AS DOUBLE) / 1000000.0) / n_bigrams")
    return f"""
WITH {_kn_ctes(discount)},
dd AS (
  SELECT b.doc_id, count(*) AS n_bigrams,
         CAST(sum(q.lq) AS BIGINT) AS s
  FROM bg b JOIN bgt q USING (bg) GROUP BY b.doc_id
)
SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams, {lp} AS logppl
FROM dd
"""


def _kn3_ctes(discount: float, train_where: str = "") -> str:
    """The shared order-3 Kneser-Ney CTE chain: whitespace-trigram
    stream (with doc_id + context/continuation parts), the five count
    tables over the TRAINING subset (`train_where` restricts it; empty
    = the whole stream), and q = quantized ln p3 per seen trigram —
    mirrored token-for-token against the Spark _kn3_tables/_kn3_p3
    helpers (p1 -> p2 -> p3 innermost-first)."""
    d = float(discount)
    return f"""
tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
tg AS (
  SELECT doc_id,
         w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tg
  FROM tokd, LATERAL unnest(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
),
t3 AS (
  SELECT tg, count(*) AS c3,
         split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS w12,
         split_part(tg, ' ', 2) AS w2,
         split_part(tg, ' ', 3) AS w3
  FROM tg {train_where} GROUP BY tg
),
ctx3 AS (
  SELECT w12, sum(c3) AS c_ctx3, count(*) AS n1f3
  FROM t3 GROUP BY w12
),
mid AS (
  SELECT w2, w3, count(*) AS c2p FROM t3 GROUP BY w2, w3
),
ctx2 AS (
  SELECT w2, sum(c2p) AS c_ctx2, count(*) AS n1f2
  FROM mid GROUP BY w2
),
low AS (SELECT w3, count(*) AS c1p FROM mid GROUP BY w3),
tot AS (SELECT count(*) AS n_types FROM mid),
q AS (
  SELECT t3.tg,
         CAST(round(ln(
           (greatest(CAST(c3 AS DOUBLE) - {d}, 0.0) / c_ctx3)
           + ((({d} * n1f3) / c_ctx3)
              * (
                (greatest(CAST(c2p AS DOUBLE) - {d}, 0.0) / c_ctx2)
                + ((({d} * n1f2) / c_ctx2)
                   * (CAST(c1p AS DOUBLE) / n_types))
              ))
         ) * 1000000) AS BIGINT) AS lq
  FROM t3
  JOIN ctx3 USING (w12)
  JOIN mid USING (w2, w3)
  JOIN ctx2 USING (w2)
  JOIN low USING (w3), tot
)"""


def kn_trigram_logppl(discount: float = 0.75) -> str:
    """Oracle for textstats.kn_trigram_logppl: the order-3 interpolated
    KN recursion (continuation counts at the middle and lowest orders),
    ln() quantized per trigram, exact integer per-doc sums — the shared
    _kn3_ctes chain with the full corpus as the training set."""
    lp = micro6_sql("-(CAST(s AS DOUBLE) / 1000000.0) / n_trigrams")
    return f"""
WITH {_kn3_ctes(discount)},
dd AS (
  SELECT g.doc_id, count(*) AS n_trigrams,
         CAST(sum(q.lq) AS BIGINT) AS s
  FROM tg g JOIN q USING (tg) GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_trigrams AS INT) AS n_trigrams, {lp} AS logppl
FROM dd
"""


def kn3_heldout_scores(discount: float = 0.75) -> str:
    """Oracle for textstats.kn3_score_with under a kn_trigram_model
    trained on the even-doc_id half — kn_heldout_scores' order-3 twin.
    Three quantized branches per scored trigram (seen / backoff through
    the middle-order continuation term / unk floor), exact integer
    per-doc sums; the backoff p2 is the SAME fixed IEEE expression the
    training chain uses."""
    d = float(discount)
    lp = micro6_sql("-(CAST(s AS DOUBLE) / 1000000.0) / n_trigrams")
    return f"""
WITH {_kn3_ctes(discount, train_where="WHERE doc_id % 2 = 0")},
sg AS (
  SELECT doc_id, tg,
         split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS w12,
         split_part(tg, ' ', 2) AS w2,
         split_part(tg, ' ', 3) AS w3
  FROM tg
),
sc AS (
  SELECT s.doc_id,
         coalesce(
           b.lq,
           CASE WHEN c3t.c_ctx3 IS NOT NULL AND m.c2p IS NOT NULL THEN
             CAST(round(ln(
               (({d} * c3t.n1f3) / c3t.c_ctx3)
               * (
                 (greatest(CAST(m.c2p AS DOUBLE) - {d}, 0.0) / c2t.c_ctx2)
                 + ((({d} * c2t.n1f2) / c2t.c_ctx2)
                    * (CAST(l.c1p AS DOUBLE) / t.n_types))
               )
             ) * 1000000) AS BIGINT)
           END,
           CAST(round(ln(1.0 / CAST(t.n_types + 1 AS DOUBLE))
                * 1000000) AS BIGINT)
         ) AS lq,
         CASE WHEN b.lq IS NULL THEN 1 ELSE 0 END AS is_bo,
         CASE WHEN b.lq IS NULL
                   AND (c3t.c_ctx3 IS NULL OR m.c2p IS NULL)
              THEN 1 ELSE 0 END AS is_oov
  FROM sg s
  LEFT JOIN q b USING (tg)
  LEFT JOIN ctx3 c3t ON s.w12 = c3t.w12
  LEFT JOIN mid m ON s.w2 = m.w2 AND s.w3 = m.w3
  LEFT JOIN ctx2 c2t ON s.w2 = c2t.w2
  LEFT JOIN low l ON s.w3 = l.w3, tot t
),
dd AS (
  SELECT doc_id, count(*) AS n_trigrams,
         CAST(sum(is_bo) - sum(is_oov) AS INT) AS n_backoff,
         CAST(sum(is_oov) AS INT) AS n_oov,
         CAST(sum(lq) AS BIGINT) AS s
  FROM sc GROUP BY doc_id
)
SELECT doc_id, CAST(n_trigrams AS INT) AS n_trigrams,
       n_backoff, n_oov, {lp} AS logppl
FROM dd
"""


def kn_heldout_scores(discount: float = 0.75) -> str:
    """Oracle for textstats.kn_score_with under a model trained on the
    even-doc_id half (kn_bigram_model): the CCNet train-on-reference /
    score-the-stream split. Three quantized branches per scored bigram
    (seen / backoff / unk floor), exact integer per-doc sums."""
    d = float(discount)
    lp = micro6_sql("-(CAST(s AS DOUBLE) / 1000000.0) / n_bigrams")
    return f"""
WITH {_kn_ctes(discount, train_where="WHERE doc_id % 2 = 0")},
sc AS (
  SELECT s.doc_id,
         coalesce(
           b.lq,
           CASE WHEN c.c_ctx IS NOT NULL AND f.n1_bwd IS NOT NULL THEN
             CAST(round(ln(
               ((({d} * c.n1_fwd) / c.c_ctx)
                * (CAST(f.n1_bwd AS DOUBLE) / t.n_types))
             ) * 1000000) AS BIGINT)
           END,
           CAST(round(ln(1.0 / CAST(t.n_types + 1 AS DOUBLE))
                * 1000000) AS BIGINT)
         ) AS lq,
         CASE WHEN b.lq IS NULL THEN 1 ELSE 0 END AS is_bo,
         CASE WHEN b.lq IS NULL
                   AND (c.c_ctx IS NULL OR f.n1_bwd IS NULL)
              THEN 1 ELSE 0 END AS is_oov
  FROM bg s
  LEFT JOIN bgt b USING (bg)
  LEFT JOIN ctx c ON s.w1 = c.w1
  LEFT JOIN bwd f ON s.w2 = f.w2, tot t
),
dd AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(is_bo) - sum(is_oov) AS INT) AS n_backoff,
         CAST(sum(is_oov) AS INT) AS n_oov,
         CAST(sum(lq) AS BIGINT) AS s
  FROM sc GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams,
       n_backoff, n_oov, {lp} AS logppl
FROM dd
"""


def unigram_logppl() -> str:
    """Deterministic unigram-LM perplexity — mirrors
    textstats.unigram_logppl (add-one smoothing over the corpus vocab,
    natural log, zero-token docs absent)."""
    return """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS w
  FROM documents
),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM uni),
p AS (SELECT w, (c + 1.0) / (tot.n + tot.v) AS pw FROM uni, tot),
d AS (
  SELECT t.doc_id, count(*) AS n_tokens, -avg(ln(p.pw)) AS lp
  FROM tok t JOIN p USING (w) GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, round(lp, 6) AS logppl
FROM d
"""


def ann_recall(query_ids: list[int], k: int = 5) -> str:
    """recall@k of the approximate ANN methods vs exact brute force —
    composes the three ANN oracles as subqueries, one row per method."""
    nq = len(query_ids)
    return f"""
WITH exact AS (
  SELECT query_id, vec_id FROM ({ann_bruteforce_topk(query_ids, k=k)}) e
),
ivf AS (SELECT query_id, vec_id FROM ({ann_ivf_topk(query_ids, k=k)}) v),
srp AS (SELECT query_id, vec_id FROM ({ann_srp_topk(query_ids, k=k)}) s),
pq AS (SELECT query_id, vec_id FROM ({ann_pq_topk(query_ids, k=k)}) p),
ivfpq AS (SELECT query_id, vec_id FROM ({ann_ivf_pq_topk(query_ids, k=k)}) ip)
SELECT 'ivf' AS method, CAST({nq} AS INT) AS n_queries, CAST({k} AS INT) AS k,
       round((SELECT count(*) FROM ivf JOIN exact USING (query_id, vec_id))
             / {nq * k}.0, 6) AS recall
UNION ALL
SELECT 'srp', CAST({nq} AS INT), CAST({k} AS INT),
       round((SELECT count(*) FROM srp JOIN exact USING (query_id, vec_id))
             / {nq * k}.0, 6)
UNION ALL
SELECT 'pq', CAST({nq} AS INT), CAST({k} AS INT),
       round((SELECT count(*) FROM pq JOIN exact USING (query_id, vec_id))
             / {nq * k}.0, 6)
UNION ALL
SELECT 'ivf_pq', CAST({nq} AS INT), CAST({k} AS INT),
       round((SELECT count(*) FROM ivfpq JOIN exact USING (query_id, vec_id))
             / {nq * k}.0, 6)
"""


def sessionize(gap_minutes: int = 360) -> str:
    """Gap-based sessionization — mirrors sessions.sessionize
    (microsecond epoch arithmetic, (ts, event_id) unique ordering)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
),
f AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS INT)
           AS session_idx
  FROM f
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6)
         AS duration_sec,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, session_idx
"""


def pmi_collocations(min_count: int = 5, k: int = 20) -> str:
    """Oracle for textstats.pmi_collocations: identical bigram/unigram
    counts, identical float op order ((c12/N_bg) / ((c1/N_tok)*(c2/N_tok))),
    natural log rounded to 6, ties broken (w1, w2) ASC."""
    return f"""
WITH tokd AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS w
  FROM documents
),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM tokd, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
pc AS (SELECT w1, w2, count(*) AS pair_count FROM bg GROUP BY 1, 2),
uc AS (
  SELECT tk AS w, count(*) AS c
  FROM (SELECT unnest(w) AS tk FROM tokd) GROUP BY 1
),
tot AS (
  SELECT (SELECT CAST(sum(pair_count) AS DOUBLE) FROM pc) AS n_bg,
         (SELECT CAST(sum(c) AS DOUBLE) FROM uc) AS n_tok
)
SELECT pc.w1, pc.w2, pc.pair_count,
       round(ln((pc.pair_count / tot.n_bg)
                / ((u1.c / tot.n_tok) * (u2.c / tot.n_tok))), 6) AS pmi
FROM pc
JOIN uc u1 ON u1.w = pc.w1
JOIN uc u2 ON u2.w = pc.w2
CROSS JOIN tot
WHERE pc.pair_count >= {min_count}
ORDER BY pmi DESC, pc.w1 ASC, pc.w2 ASC
LIMIT {k}
"""


def link_prediction_aa(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
    hub_ceiling: int = 256,
    k: int = 50,
) -> str:
    """Oracle for graph.adamic_adar on the capped co-occurrence
    subgraph: identical wedge generation (center-join with the same
    hub_ceiling pre-filter), identical 1.0/ln(deg) contribution,
    anti-join against existing undirected edges, (a, b) ASC tiebreak."""
    return f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub UNION SELECT dst, src FROM sub
),
deg AS (SELECT u AS z, count(*) AS deg_z FROM und GROUP BY u),
nz AS MATERIALIZED (
  SELECT und.u AS z, und.v AS n, deg.deg_z
  FROM und JOIN deg ON deg.z = und.u
  WHERE deg.deg_z <= {hub_ceiling}
),
w AS (
  SELECT x.n AS a, y.n AS b, 1.0 / ln(x.deg_z) AS contrib
  FROM nz x JOIN nz y ON x.z = y.z AND x.n < y.n
),
scored AS (
  SELECT a, b, count(*) AS common_neighbors,
         round(sum(contrib), 6) AS adamic_adar
  FROM w GROUP BY a, b
),
ex AS (SELECT u AS a, v AS b FROM und WHERE u < v)
SELECT s.a, s.b, s.common_neighbors, s.adamic_adar
FROM scored s
ANTI JOIN ex ON ex.a = s.a AND ex.b = s.b
ORDER BY s.adamic_adar DESC, s.a ASC, s.b ASC
LIMIT {k}
"""


def kmv_source_overlap(
    src_a: str = "src0", src_b: str = "src1", k: int = 128
) -> str:
    """Oracle for sketches.kmv_set_estimates over per-source word-bigram
    sets: identical md5 bottom-k sketches, union-sketch merge, K∩
    membership count, and float op order for the three estimates."""
    h = duckdb_md5_hash64_sql("key")
    f = f"(CAST(union_kth_hash AS DOUBLE) / {float(1 << 60)})"
    ue = f"({float(k - 1)} / {f})"
    rho = f"(CAST(k_cap AS DOUBLE) / {float(k)})"
    return f"""
WITH tokd AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS l
  FROM documents WHERE source IN ('{src_a}', '{src_b}')
),
bg AS (
  SELECT source, l[i] || ' ' || l[i + 1] AS key
  FROM tokd, LATERAL unnest(generate_series(1, len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
),
da AS (SELECT DISTINCT key FROM bg WHERE source = '{src_a}'),
db AS (SELECT DISTINCT key FROM bg WHERE source = '{src_b}'),
sa AS (SELECT {h} AS h FROM da ORDER BY h LIMIT {k}),
sb AS (SELECT {h} AS h FROM db ORDER BY h LIMIT {k}),
su AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
       ORDER BY h LIMIT {k}),
kc AS (SELECT count(*) AS k_cap FROM su
       WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
kt AS (SELECT max(h) AS union_kth_hash, count(*) AS nk FROM su),
m AS (SELECT key, count(*) AS ng
      FROM (SELECT key FROM da UNION ALL SELECT key FROM db)
      GROUP BY key),
ex AS (SELECT count(*) AS exact_union,
              CAST(sum(CASE WHEN ng = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS exact_intersection
       FROM m)
SELECT {k} AS k, union_kth_hash,
       round({ue}, 6) AS union_estimate,
       round({rho}, 6) AS jaccard_estimate,
       round({rho} * {ue}, 6) AS intersection_estimate,
       exact_union, exact_intersection
FROM kt, kc, ex WHERE nk = {k}
"""


def vocab_coverage(vocab_size: int = 20) -> str:
    """Oracle for textstats.vocab_coverage: identical top-N vocab
    (count DESC, token ASC) and per-source OOV occurrence rate."""
    return f"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS w
  FROM documents
),
vocab AS (
  SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
  ORDER BY c DESC, w ASC LIMIT {vocab_size}
),
flagged AS (
  SELECT t.source,
         CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v ON v.w = t.w
)
SELECT source,
       count(*) AS n_tokens,
       CAST(sum(oov) AS BIGINT) AS oov_tokens,
       round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
FROM flagged GROUP BY source
"""


def ndcg_metrics(k: int = 10) -> str:
    """Oracle for quality.ndcg over the same synthetic gold harness as
    quality_metrics: results = first 10 docs per source by id, gold =
    docs ≡0 (mod 4) graded rel = 1 + (doc_id % 3); identical
    (2^rel - 1)/log2(pos + 1) gains and (rel DESC, file ASC) ideal
    ordering."""
    return f"""
WITH res AS (
  SELECT source AS query_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank,
         'doc_' || CAST(doc_id AS VARCHAR) AS file
  FROM documents
),
res10 AS (SELECT * FROM res WHERE rank <= 10),
gold AS (
  SELECT source AS query_id,
         'doc_' || CAST(doc_id AS VARCHAR) AS file,
         1 + (doc_id % 3) AS rel
  FROM documents WHERE doc_id % 4 = 0
),
dcg AS (
  SELECT r.query_id,
         sum((pow(2.0, g.rel) - 1.0) / log2(r.rank + 1.0)) AS dcg
  FROM res10 r JOIN gold g USING (query_id, file)
  WHERE r.rank <= {k}
  GROUP BY r.query_id
),
ig AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, file ASC) AS i
  FROM gold
),
idcg AS (
  SELECT query_id,
         sum((pow(2.0, rel) - 1.0) / log2(i + 1.0)) AS idcg
  FROM ig WHERE i <= {k} GROUP BY query_id
)
SELECT idcg.query_id,
       round(coalesce(dcg.dcg, 0.0), 6) AS dcg,
       round(idcg.idcg, 6) AS idcg,
       round(CASE WHEN idcg.idcg > 0
                  THEN coalesce(dcg.dcg, 0.0) / idcg.idcg
                  ELSE 0.0 END, 6) AS ndcg
FROM idcg LEFT JOIN dcg USING (query_id)
"""


def char_entropy() -> str:
    """Oracle for textstats.char_entropy: identical char explode, the
    same one-pass identity log2(N) - sum(n*log2(n))/N, and the same
    integer-microunit emission (functions/emit.py) so the float column
    is bit-identical across engines."""
    ent = micro6_sql("log2(sum(n)) - sum(n * log2(n)) / sum(n)")
    return f"""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
per AS (SELECT doc_id, c, count(*) AS n FROM ch
        WHERE length(c) > 0 GROUP BY doc_id, c)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(count(*) AS INT) AS distinct_chars,
       {ent} AS entropy_bits
FROM per GROUP BY doc_id
ORDER BY doc_id
"""


def graph_msf(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
    max_rounds: int = 14,
) -> str:
    """Oracle for graph.minimum_spanning_forest on the capped
    co-occurrence subgraph — max_rounds unrolled Borůvka rounds (the
    k_core unroll pattern): each round computes EXACT component labels
    of the selected forest via a recursive min-reachability closure
    (the Spark side's pointer-jumped label loop runs to the same
    fixpoint), then every component's minimum cross edge under the
    strict (weight, src, dst) total order; converged rounds are no-ops,
    so fixed-round SQL equals the Spark side's early-exit loop."""
    parts = [
        f"""
WITH RECURSIVE {_COOC_EDGES},
sub AS (SELECT src, dst, weight FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
e AS MATERIALIZED (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
         min(weight) AS weight
  FROM sub WHERE src <> dst GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT u AS v
  FROM (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)
),
s0(src, dst, weight) AS (SELECT src, dst, weight FROM e WHERE FALSE)"""
    ]
    for r in range(1, max_rounds + 1):
        p = r - 1
        parts.append(f""",
us{p} AS MATERIALIZED (SELECT src AS u, dst AS v FROM s{p}
          UNION SELECT dst, src FROM s{p}),
reach{r}(v, lbl) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT ed2.v, rr.lbl FROM reach{r} rr JOIN us{p} ed2 ON ed2.u = rr.v
),
lab{r} AS MATERIALIZED (SELECT v, min(lbl) AS comp FROM reach{r} GROUP BY v),
cr{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight, lu.comp AS cu, lv.comp AS cv
  FROM e
  JOIN lab{r} lu ON lu.v = e.src
  JOIN lab{r} lv ON lv.v = e.dst
  WHERE lu.comp <> lv.comp
),
mn{r} AS MATERIALIZED (
  SELECT DISTINCT src, dst, weight FROM (
    SELECT b.*, row_number() OVER (
      PARTITION BY comp ORDER BY weight, src, dst) AS rn
    FROM (SELECT cu AS comp, src, dst, weight FROM cr{r}
          UNION ALL
          SELECT cv AS comp, src, dst, weight FROM cr{r}) b
  ) WHERE rn = 1
),
s{r} AS MATERIALIZED (SELECT * FROM s{p} UNION SELECT * FROM mn{r})""")
    parts.append(f"""
SELECT src, dst, weight FROM s{max_rounds}""")
    return "".join(parts)


def random_walks(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
    walk_len: int = 4,
) -> str:
    """Oracle for graph.random_walks on the capped co-occurrence
    subgraph: identical md5 pseudo-random neighbor pick per
    (walk, step), unrolled walk_len steps."""
    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
und AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sub WHERE src <> dst
  UNION SELECT dst, src FROM sub WHERE src <> dst
),
w0 AS (SELECT DISTINCT u AS walk_id, CAST(0 AS INT) AS step, u AS node
       FROM und)"""
    ]
    for t in range(1, walk_len + 1):
        h = duckdb_md5_hash64_sql(
            f"CAST(c.walk_id AS VARCHAR) || '|' || '{t}' || '|' "
            f"|| CAST(e.v AS VARCHAR)",
            salt="walk|",
        )
        parts.append(f""",
w{t} AS MATERIALIZED (
  SELECT walk_id, CAST({t} AS INT) AS step, v AS node FROM (
    SELECT c.walk_id, e.v,
           row_number() OVER (PARTITION BY c.walk_id
                              ORDER BY {h} ASC, e.v ASC) AS rn
    FROM w{t - 1} c JOIN und e ON e.u = c.node
  ) WHERE rn = 1
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM w{t}" for t in range(walk_len + 1)
    )
    parts.append(f"""
{union}""")
    return "".join(parts)


def key_skew_report(key_expr: str = "user_id") -> str:
    """Oracle for skew.key_skew_report over events: identical
    ascending-(count, key) rank, identical Gini float op order, and the
    same integer-microunit emission (functions/emit.py)."""
    share = micro6_sql("CAST(top_c AS DOUBLE) / n_rows")
    gini = micro6_sql(
        "(2.0 * s) / (CAST(n_keys AS DOUBLE) * n_rows)"
        " - (n_keys + 1.0) / n_keys"
    )
    return f"""
WITH cnt AS (
  SELECT {key_expr} AS key, count(*) AS c FROM events GROUP BY 1
),
ranked AS (
  SELECT key, c, row_number() OVER (ORDER BY c ASC, key ASC) AS i
  FROM cnt
),
top AS (
  SELECT key AS top_key, c AS top_c FROM cnt
  ORDER BY c DESC, key ASC LIMIT 1
),
agg AS (
  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         sum(i * c) AS s
  FROM ranked
)
SELECT n_keys, n_rows, top_key,
       {share} AS top_share,
       {gini} AS gini
FROM agg, top
"""


def fuzzy_term_pairs(min_count: int = 2, max_dist: int = 2) -> str:
    """Oracle for textstats.fuzzy_term_pairs — deliberately the
    BRUTE-FORCE O(V²) levenshtein join over the same vocabulary, so a
    hash match proves the Spark side's deletion-neighborhood blocking
    lossless (every pair within distance found, none invented)."""
    return f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS w
  FROM documents
),
uc AS (
  SELECT w, count(*) AS c FROM tok GROUP BY w HAVING count(*) >= {min_count}
)
SELECT a.w AS term_a, b.w AS term_b,
       CAST(levenshtein(a.w, b.w) AS INT) AS dist,
       a.c AS count_a, b.c AS count_b
FROM uc a JOIN uc b ON a.w < b.w
WHERE levenshtein(a.w, b.w) BETWEEN 1 AND {max_dist}
"""


def graph_ktruss(
    cap_sql: str = "(SELECT count(*) // 4 FROM part)",
    k: int = 4,
    n_iters: int = 10,
) -> str:
    """Oracle for graph.k_truss on the capped co-occurrence subgraph —
    n_iters unrolled support-peeling rounds (the k_core unroll
    pattern), each round replaying triangle_counts' degree-ordered
    orientation (key = deg*10^12 + node_id) on the CURRENT edge set;
    converged rounds are no-ops, so fixed-round SQL equals the Spark
    side's early-exit loop. Final support recomputed on the surviving
    edge set, exactly as the operator does."""
    def tri_chain(p: str) -> str:
        return f"""
und{p} AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM e{p} UNION ALL SELECT v, u FROM e{p}
),
deg{p} AS (SELECT src AS node_id, count(*) AS d FROM und{p} GROUP BY src),
key{p} AS (SELECT node_id, d * 1000000000000 + node_id AS kk FROM deg{p}),
o{p} AS MATERIALIZED (
  SELECT ed2.src, ed2.dst, ks.kk AS ks, kd.kk AS kd
  FROM und{p} ed2
  JOIN key{p} ks ON ks.node_id = ed2.src
  JOIN key{p} kd ON kd.node_id = ed2.dst
  WHERE ks.kk < kd.kk
),
t{p} AS MATERIALIZED (
  SELECT w.a, w.b, w.c FROM (
    SELECT x.src AS a, x.dst AS b, y.dst AS c
    FROM o{p} x JOIN o{p} y ON x.src = y.src AND x.kd < y.kd
  ) w JOIN o{p} z ON z.src = w.b AND z.dst = w.c
),
sup{p} AS MATERIALIZED (
  SELECT least(x, y) AS u, greatest(x, y) AS v, count(*) AS support
  FROM (SELECT a AS x, b AS y FROM t{p}
        UNION ALL SELECT a, c FROM t{p}
        UNION ALL SELECT b, c FROM t{p})
  GROUP BY 1, 2
)"""

    parts = [
        f"""
WITH {_COOC_EDGES},
sub AS (SELECT src, dst FROM ed
        WHERE src < {cap_sql} AND dst < {cap_sql}),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM sub WHERE src <> dst
)"""
    ]
    for r in range(1, n_iters + 1):
        p = r - 1
        parts.append("," + tri_chain(str(p)))
        parts.append(f""",
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{p} e
  LEFT JOIN sup{p} s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.support, 0) >= {k - 2}
)""")
    parts.append("," + tri_chain(str(n_iters)))
    parts.append(f"""
SELECT e.u, e.v, coalesce(s.support, 0) AS support
FROM e{n_iters} e
LEFT JOIN sup{n_iters} s ON s.u = e.u AND s.v = e.v""")
    return "".join(parts)


def kmeans_topics(k: int = 8, n_rounds: int = 3) -> str:
    """Oracle for ann.lloyd_kmeans: the identical n_rounds-unrolled Lloyd
    chain (the k_core/k_truss fixed-round discipline) — first-k init,
    min-squared-distance assignment with (d ASC, cluster_id ASC)
    tie-break, per-dimension means ROUNDED to 6 so both engines carry
    bit-identical centroids into the next round, empty clusters keeping
    the previous centroid."""
    parts = [f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pv AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS val
  FROM pts
),
c0 AS (
  SELECT CAST(vec_id AS INT) AS cluster_id, pos, val
  FROM pv WHERE vec_id < {k}
)"""]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(f""",
d{p} AS MATERIALIZED (
  SELECT pv.vec_id, c.cluster_id,
         sum((pv.val - c.val) * (pv.val - c.val)) AS d
  FROM pv JOIN c{p} c ON c.pos = pv.pos
  GROUP BY 1, 2
),
a{p} AS MATERIALIZED (
  SELECT vec_id, cluster_id,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC
         ) AS rn
  FROM d{p}
),
m{r} AS (
  SELECT a.cluster_id, pv.pos, round(avg(pv.val), 6) AS val
  FROM a{p} a JOIN pv ON pv.vec_id = a.vec_id
  WHERE a.rn = 1
  GROUP BY 1, 2
),
c{r} AS (
  SELECT c.cluster_id, c.pos, coalesce(m.val, c.val) AS val
  FROM c{p} c
  LEFT JOIN m{r} m ON m.cluster_id = c.cluster_id AND m.pos = c.pos
)""")
    n = n_rounds
    parts.append(f""",
df AS (
  SELECT pv.vec_id, c.cluster_id,
         sum((pv.val - c.val) * (pv.val - c.val)) AS d
  FROM pv JOIN c{n} c ON c.pos = pv.pos
  GROUP BY 1, 2
),
af AS (
  SELECT vec_id, cluster_id, d,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC
         ) AS rn
  FROM df
)
SELECT vec_id, cluster_id, round(d, 6) AS dist
FROM af WHERE rn = 1""")
    return "".join(parts)


def temperature_mixture(alpha: float = 0.3) -> str:
    """Oracle for curation.temperature_mixture: per-source token shares,
    then sampled_share = p^alpha / sum(p^alpha) and boost =
    sampled/observed — the same whitespace token aggregate as
    mixture_plan."""
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> length(t) > 0)) AS ws
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS n_tokens
  FROM toks GROUP BY source
),
shared AS (
  SELECT source, n_docs, n_tokens,
         sum(n_tokens) OVER () AS tot,
         n_tokens / sum(n_tokens) OVER () AS p,
         pow(n_tokens / sum(n_tokens) OVER (), CAST({float(alpha)!r} AS DOUBLE)) AS pa
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(p, 6) AS observed_share,
       round(pa / sum(pa) OVER (), 6) AS sampled_share,
       round((pa / sum(pa) OVER ()) / p, 6) AS boost
FROM shared
WHERE tot > 0
"""


def feature_drift_psi(width: float = 5.0, eps: float = 1e-4) -> str:
    """Oracle for quality.feature_drift_psi: split at (min+max)/2 of the
    FRACTIONAL epoch seconds (DuckDB epoch(ts) == Spark's cast-to-double,
    r8 ADVICE), fixed-width value buckets, add-eps smoothed shares over
    each group's bucket union, PSI in integer microunits (functions/
    emit.py) with the > 0.2 flag compared on the same microunit value."""
    psi = micro6_sql("sum((p_cur - p_ref) * ln(p_cur / p_ref))")
    return f"""
WITH mid AS (
  SELECT (epoch(max(ts)) + epoch(min(ts))) / 2 AS m FROM events
),
sided AS (
  SELECT event_type AS grp,
         CAST(floor(value / {float(width)!r}) AS BIGINT) AS bucket,
         CASE WHEN epoch(ts) < (SELECT m FROM mid) THEN 'ref'
              ELSE 'cur' END AS side
  FROM events
),
counts AS (
  SELECT grp, bucket,
         sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS c_cur
  FROM sided GROUP BY 1, 2
),
per_grp AS (
  SELECT grp, CAST(sum(c_ref) AS BIGINT) AS n_ref,
         CAST(sum(c_cur) AS BIGINT) AS n_cur,
         count(*) AS n_buckets
  FROM counts GROUP BY 1
),
shares AS (
  SELECT c.grp, g.n_ref, g.n_cur,
         (c.c_ref + {float(eps)!r}) / (g.n_ref + {float(eps)!r} * g.n_buckets) AS p_ref,
         (c.c_cur + {float(eps)!r}) / (g.n_cur + {float(eps)!r} * g.n_buckets) AS p_cur
  FROM counts c JOIN per_grp g ON g.grp = c.grp
)
SELECT grp AS event_type, n_ref, n_cur,
       {psi} AS psi,
       {psi} > 0.2 AS drifted
FROM shares
GROUP BY 1, 2, 3
ORDER BY 1
"""


def contrastive_pairs(
    pos_threshold: float = 0.9,
    neg_lo: float = 0.3,
    neg_hi: float = 0.8,
    per_anchor: int = 1,
) -> str:
    """Oracle for dedup.contrastive_pairs: the same perturbed corpus and
    label-blocked pair set as embedding_neardup, split into the positive
    leg (cos >= pos_threshold) and the per-anchor top hard negatives
    (cos in [neg_lo, neg_hi), row_number by cos DESC / id ASC over the
    symmetrized pairs), inner-joined on the anchor."""
    cos = duckdb_cosine_sql("ea", "eb")
    dbl = "list_transform(generate_series(1, len(embedding)), i -> CAST(embedding[i] AS DOUBLE))"
    pert = (
        "list_transform(generate_series(1, len(embedding)), "
        "i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.01 "
        "ELSE CAST(embedding[i] AS DOUBLE) END)"
    )
    return f"""
WITH vc AS (
  SELECT vec_id, label, {dbl} AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id, label, {pert} AS e
  FROM embeddings WHERE vec_id % 10 = 0
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
  FROM vc a JOIN vc b ON a.label = b.label AND a.vec_id < b.vec_id
),
scored AS MATERIALIZED (SELECT id_a, id_b, {cos} AS cos_sim FROM p),
pos AS (
  SELECT id_a AS anchor_id, id_b AS pos_id, round(cos_sim, 6) AS pos_cos
  FROM scored WHERE cos_sim >= {pos_threshold}
),
sym AS (
  SELECT id_a AS anchor_id, id_b AS nid, cos_sim FROM scored
  UNION ALL
  SELECT id_b, id_a, cos_sim FROM scored
),
neg AS (
  SELECT anchor_id, nid AS neg_id, round(cos_sim, 6) AS neg_cos
  FROM (
    SELECT anchor_id, nid, cos_sim,
           row_number() OVER (
             PARTITION BY anchor_id ORDER BY cos_sim DESC, nid ASC
           ) AS rn
    FROM sym WHERE cos_sim >= {neg_lo} AND cos_sim < {neg_hi}
  ) WHERE rn <= {per_anchor}
)
SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
"""


def cluster_balanced_sample(
    k: int = 8, n_rounds: int = 3, per_cluster: int = 10
) -> str:
    """Oracle for ann.cluster_balanced_sample: the kmeans_topics unrolled
    Lloyd chain as a subquery, then the per-cluster consistent-hash
    bottom-per_cluster rank (same 'cbs|' salt and (hash ASC, id ASC)
    order as the operator)."""
    h = duckdb_md5_hash64_sql("CAST(vec_id AS VARCHAR)", salt="cbs|")
    return f"""
SELECT vec_id, cluster_id, rnk FROM (
  SELECT vec_id, cluster_id,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY h ASC, vec_id ASC
         ) AS rnk
  FROM (
    SELECT vec_id, cluster_id, {h} AS h
    FROM ({kmeans_topics(k, n_rounds)}) asg
  )
)
WHERE rnk <= {per_cluster}
"""


def _bpe_ctes(n_merges: int = 8) -> str:
    """The shared unrolled BPE merge-round CTE chain (operators/bpe.py):
    w0 = frequency-weighted character-level vocabulary, then per round
    pair counts → argmax pair (count DESC, pair ASC) → ONE literal
    replace on the double-separator symbol string. replace() has the
    same left-to-right non-overlapping no-rescan semantics in DuckDB
    and Spark, so the merge chain is exact — no floats anywhere."""
    s = "chr(31)"
    b = "(chr(31) || chr(31))"
    parts = [
        f"""
w0 AS MATERIALIZED (
  SELECT word, count(*) AS wc,
         {b} || array_to_string(
           list_filter(string_split(word, ''), c -> length(c) > 0), {b}
         ) || {b} AS repr
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, {s})
  GROUP BY word
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT pr.l AS lhs, pr.r AS rhs, sum(wc) AS cnt
  FROM (
    SELECT wc,
           unnest(list_transform(generate_series(1, len(syms) - 1),
                  i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS pr
    FROM (SELECT wc, (string_split(repr, {b}))[2:len(string_split(repr, {b})) - 1]
                 AS syms
          FROM w{p})
  )
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT lhs, rhs, cnt FROM p{r} ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT word, wc,
         CASE WHEN lhs IS NULL THEN repr
              ELSE replace(repr, {s} || lhs || {b} || rhs || {s},
                           {s} || lhs || rhs || {s}) END AS repr
  FROM w{p} LEFT JOIN b{r} ON TRUE
)""")
    return "".join(parts)


def bpe_merges(n_merges: int = 8) -> str:
    """Oracle for bpe.bpe_merges: the unrolled merge chain, emitting each
    round's argmax pair."""
    sel = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, lhs AS left_sym, rhs AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH {_bpe_ctes(n_merges)}
{sel}
ORDER BY merge_round
"""


def bpe_doc_tokens(n_merges: int = 8) -> str:
    """Oracle for bpe.bpe_doc_tokens: per-document token counts under the
    learned vocabulary — occurrences joined against the trained word
    table's symbol counts."""
    b = "(chr(31) || chr(31))"
    return f"""
WITH {_bpe_ctes(n_merges)},
seg AS (
  SELECT word, len(string_split(repr, {b})) - 2 AS n_syms FROM w{n_merges}
),
occ AS (
  SELECT doc_id, word, count(*) AS occ
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, chr(31))
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_words,
       CAST(sum(occ * n_syms) AS BIGINT) AS n_bpe_tokens
FROM occ JOIN seg USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""


def ann_store_drift(n_cells: int = 10, eps: float = 1e-4) -> str:
    """Oracle for ann.ann_store_drift over the maintained-store query:
    reference = IVF cell occupancy of the embeddings corpus against the
    frozen first-n_cells centroids (exactly what the store holds at
    build time); current = the same assignment of the DRIFTED corpus
    (vectors with vec_id % 3 == 0 shifted by +8.0 in every dimension —
    an exact IEEE op replayable in both engines, and a real
    DISTRIBUTION shift: the drifted third aligns with the all-positive
    direction and collapses into its dominant cell, unlike a
    permutation-style drift that leaves shares flat); PSI with add-eps
    smoothing over the bucket union and microunit emission
    (quality.psi_vs_reference's formula verbatim)."""
    dot_ec = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    dot_pc = (
        "list_sum(list_transform(generate_series(1, len(e.emb)), "
        "i -> e.emb[i] * CAST(c.embedding[i] AS DOUBLE)))"
    )
    psi = micro6_sql("sum((p_cur - p_ref) * ln(p_cur / p_ref))")
    e = float(eps)
    return f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < {n_cells}
),
refass AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_ec} DESC, c.cell_id ASC) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
),
refb AS (
  SELECT CAST(cell_id AS BIGINT) AS bucket, count(*) AS c_ref
  FROM refass GROUP BY 1
),
cur0 AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(embedding)),
           i -> CASE WHEN vec_id % 3 = 0
                     THEN CAST(embedding[i] AS DOUBLE) + 8.0
                     ELSE CAST(embedding[i] AS DOUBLE) END) AS emb
  FROM embeddings
),
curass AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot_pc} DESC, c.cell_id ASC) AS r
    FROM cur0 e CROSS JOIN cents c
  ) WHERE r = 1
),
curb AS (
  SELECT CAST(cell_id AS BIGINT) AS bucket, count(*) AS c_cur
  FROM curass GROUP BY 1
),
counts AS (
  SELECT coalesce(refb.bucket, curb.bucket) AS bucket,
         coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
  FROM refb FULL OUTER JOIN curb ON refb.bucket = curb.bucket
),
tot AS (
  SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
         CAST(sum(c_cur) AS BIGINT) AS n_cur, count(*) AS nb
  FROM counts
),
shares AS (
  SELECT t.n_ref, t.n_cur,
         (c.c_ref + {e!r}) / (t.n_ref + {e!r} * t.nb) AS p_ref,
         (c.c_cur + {e!r}) / (t.n_cur + {e!r} * t.nb) AS p_cur
  FROM counts c, tot t
)
SELECT 'ann_cells' AS grp, n_ref, n_cur,
       {psi} AS psi,
       {psi} > 0.2 AS drifted
FROM shares
GROUP BY 1, 2, 3
ORDER BY 1
"""


def sequence_packing_bpe(budget: int = 512, n_merges: int = 8) -> str:
    """Oracle for packing.pack_documents_bpe: the sequence_packing
    recursive first-fit walk with token counts from the LEARNED BPE
    vocabulary — the bpe_doc_tokens chain nested verbatim, zero-token
    docs kept at 0 via the left join (mirroring the Spark side)."""
    b = "(chr(31) || chr(31))"
    return f"""
WITH RECURSIVE {_bpe_ctes(n_merges)},
seg AS (
  SELECT word, len(string_split(repr, {b})) - 2 AS n_syms FROM w{n_merges}
),
occ AS (
  SELECT doc_id, word, count(*) AS occ
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, chr(31))
  GROUP BY 1, 2
),
bt AS (
  SELECT doc_id, CAST(sum(occ * n_syms) AS INT) AS tokens
  FROM occ JOIN seg USING (word)
  GROUP BY doc_id
),
tok AS (
  SELECT d.source, d.doc_id, coalesce(bt.tokens, 0) AS tokens,
         row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
  FROM documents d LEFT JOIN bt USING (doc_id)
),
walk AS (
  SELECT source, doc_id, rn, tokens, 0 AS bin_id, tokens AS bin_fill
  FROM tok WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.rn, t.tokens,
         CASE WHEN w.bin_fill + t.tokens > {budget}
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.bin_fill + t.tokens > {budget}
              THEN t.tokens ELSE w.bin_fill + t.tokens END
  FROM walk w JOIN tok t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT source, doc_id, tokens,
       CAST(bin_id AS INT) AS bin_id, CAST(bin_fill AS INT) AS bin_fill
FROM walk
"""


def bpe_fertility(n_merges: int = 8) -> str:
    """Oracle for bpe.bpe_fertility: the bpe_doc_tokens chain nested
    verbatim, rolled up per source with the integer-microunit fertility
    emission (functions/emit.py). Zero-word docs are absent from the
    inner join on both sides."""
    b = "(chr(31) || chr(31))"
    fert = micro6_sql(
        "CAST(sum(bt.n_bpe) AS DOUBLE) / sum(bt.n_words)"
    )
    return f"""
WITH {_bpe_ctes(n_merges)},
seg AS (
  SELECT word, len(string_split(repr, {b})) - 2 AS n_syms FROM w{n_merges}
),
occ AS (
  SELECT doc_id, word, count(*) AS occ
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, chr(31))
  GROUP BY 1, 2
),
bt AS (
  SELECT doc_id,
         CAST(sum(occ) AS BIGINT) AS n_words,
         CAST(sum(occ * n_syms) AS BIGINT) AS n_bpe
  FROM occ JOIN seg USING (word)
  GROUP BY doc_id
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(bt.n_words) AS BIGINT) AS n_words,
       CAST(sum(bt.n_bpe) AS BIGINT) AS n_bpe_tokens,
       {fert} AS fertility
FROM documents d JOIN bt USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


def _qc_ctes(
    dim: int = 32, tau: float = 0.512, lr: float = 2.0, rounds: int = 4,
    train_join: str = "",
) -> str:
    """CTE chain for the trained quality classifier
    (quality_classifier.train_quality_classifier): hashed-unigram
    microunit features + bootstrapped heuristic seed labels, then
    `rounds` unrolled full-batch logistic-GD steps. Every sum is an
    exact int64 microunit aggregate; the only libm call is exp() on a
    bit-identical double (the Spark plan's arithmetic tree is mirrored
    token for token — see the operator's module doc). `train_join`
    (e.g. a source-restriction join) narrows the TRAINING label set
    `lab`; `lab_all` always carries every document's seed label for
    audit emission (the independent-validation variant)."""
    h = duckdb_md5_hash64_sql("w", salt="qc|")
    stop = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])
    parts = [f"""toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS toks
  FROM documents
),
words AS (SELECT doc_id, unnest(toks) AS w FROM toks),
cnts AS (
  SELECT doc_id, ({h}) % {dim} AS feat_id, count(*) AS cnt
  FROM words GROUP BY 1, 2
),
tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS nw FROM cnts GROUP BY 1),
fx AS MATERIALIZED (
  SELECT c.doc_id, c.feat_id,
         CAST(round(CAST(c.cnt AS DOUBLE) / CAST(t.nw AS DOUBLE) * 1000000)
              AS BIGINT) AS x6
  FROM cnts c JOIN tot t USING (doc_id)
  UNION ALL
  SELECT doc_id, {dim} AS feat_id, 1000000 AS x6 FROM documents
),
qf AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
           AS n_punct,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> length(t) > 0) AS toks
  FROM documents
),
qr AS (
  SELECT doc_id, len(toks) AS n_tokens,
         n_punct / greatest(n_chars, 1) AS punct_ratio,
         len(list_filter(toks, t -> list_contains([{stop}], t)))
           / greatest(len(toks), 1) AS stopword_ratio
  FROM qf
),
lab_all AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN (CASE WHEN n_tokens < 20
                    THEN (0.5 * stopword_ratio + 0.5 * (1.0 - punct_ratio)) * 0.5
                    ELSE 0.5 * stopword_ratio + 0.5 * (1.0 - punct_ratio) END)
                   >= {tau!r}
              THEN 1 ELSE 0 END AS y
  FROM qr
),
lab AS MATERIALIZED (
  SELECT l.doc_id, l.y FROM lab_all l {train_join}
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM lab),
w0 AS (SELECT CAST(unnest(generate_series(0, {dim})) AS BIGINT) AS feat_id,
              0.0 AS wt)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
m{r} AS (
  SELECT f.doc_id, sum(f.x6 * CAST(round(w.wt * 1000000) AS BIGINT)) AS m6
  FROM fx f JOIN w{p} w USING (feat_id) GROUP BY 1
),
p{r} AS MATERIALIZED (
  SELECT l.doc_id, l.y,
         CAST(round(1000000.0 / (1.0 + exp(-(CAST(m.m6 AS DOUBLE)
                                             / 1000000000000.0))))
              AS BIGINT) AS p6
  FROM lab l JOIN m{r} m USING (doc_id)
),
g{r} AS (
  SELECT f.feat_id,
         CAST(sum(f.x6 * (p.y * 1000000 - p.p6)) AS DOUBLE) AS g
  FROM fx f JOIN p{r} p USING (doc_id) GROUP BY 1
),
w{r} AS MATERIALIZED (
  SELECT w.feat_id,
         CAST(round((w.wt + {lr!r} * coalesce(g.g, 0.0)
                     / (1000000000000.0 * n.nd)) * 1000000) AS BIGINT)
           / 1000000.0 AS wt
  FROM w{p} w LEFT JOIN g{r} g USING (feat_id), n
)""")
    return "".join(parts)


def quality_classifier_weights(rounds: int = 4) -> str:
    """Oracle for quality_classifier.quality_classifier_weights: the
    identical unrolled GD chain, emitting the final weight table."""
    return f"""
WITH {_qc_ctes(rounds=rounds)}
SELECT feat_id, wt AS weight FROM w{rounds} ORDER BY feat_id
"""


def quality_classifier_scores(rounds: int = 4) -> str:
    """Oracle for quality_classifier.quality_classifier_scores: one more
    margin pass under the final weights, sigmoid re-quantized to integer
    microunits, pred on the integer threshold."""
    return f"""
WITH {_qc_ctes(rounds=rounds)},
mf AS (
  SELECT f.doc_id, sum(f.x6 * CAST(round(w.wt * 1000000) AS BIGINT)) AS m6
  FROM fx f JOIN w{rounds} w USING (feat_id) GROUP BY 1
),
pf AS (
  SELECT l.doc_id, l.y,
         CAST(round(1000000.0 / (1.0 + exp(-(CAST(m.m6 AS DOUBLE)
                                             / 1000000000000.0))))
              AS BIGINT) AS p6
  FROM lab l JOIN mf m USING (doc_id)
)
SELECT doc_id, CAST(y AS BIGINT) AS label,
       CAST(p6 AS DOUBLE) / 1000000.0 AS score,
       CAST(CASE WHEN p6 >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM pf ORDER BY doc_id
"""


def quality_classifier_indep_scores(
    rounds: int = 4, holdout_source: str = "src1"
) -> str:
    """Oracle for quality_classifier.quality_classifier_indep_scores:
    the identical GD chain with the label (and gradient) set restricted
    to train sources via `train_join`, then one margin pass over EVERY
    document — held-out rows labeled from lab_all (never seen in
    training) with the is_holdout flag from the documents table."""
    tj = (
        "JOIN documents dd ON l.doc_id = dd.doc_id "
        f"AND dd.source <> '{holdout_source}'"
    )
    return f"""
WITH {_qc_ctes(rounds=rounds, train_join=tj)},
mf AS (
  SELECT f.doc_id, sum(f.x6 * CAST(round(w.wt * 1000000) AS BIGINT)) AS m6
  FROM fx f JOIN w{rounds} w USING (feat_id) GROUP BY 1
),
pf AS (
  SELECT la.doc_id, la.y,
         CAST(round(1000000.0 / (1.0 + exp(-(CAST(m.m6 AS DOUBLE)
                                             / 1000000000000.0))))
              AS BIGINT) AS p6
  FROM lab_all la JOIN mf m USING (doc_id)
)
SELECT p.doc_id,
       CAST(CASE WHEN d.source = '{holdout_source}' THEN 1 ELSE 0 END
            AS BIGINT) AS is_holdout,
       CAST(y AS BIGINT) AS label,
       CAST(p6 AS DOUBLE) / 1000000.0 AS score,
       CAST(CASE WHEN p6 >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM pf p JOIN documents d USING (doc_id) ORDER BY p.doc_id
"""


def _pca_ctes(rounds: int = 8, dim: int = 64) -> str:
    """The shared CTE chain of the PCA oracles: quantized inputs,
    exact-integer covariance, MATERIALIZED unrolled power-iteration
    rounds (inlined CTEs re-expand exponentially), sign/trace/eigval
    tables. Ends after `ei` — callers append their final SELECT."""
    import math as _math

    v06 = round(1e6 / _math.sqrt(dim))
    rounds_sql = []
    prev = "v0"
    for r in range(1, rounds + 1):
        rounds_sql.append(f"""
u{r} AS MATERIALIZED (
  SELECT cd.i,
         CAST(sum(CAST(round(cd.cd
           * (CAST({prev}.v6 AS DOUBLE) / 1000000.0)
           * 1000000) AS BIGINT)) AS BIGINT) AS u6
  FROM cd JOIN {prev} ON cd.j = {prev}.j GROUP BY cd.i
),
q{r} AS MATERIALIZED (
  SELECT CAST(sum(CAST(round(
           (CAST(u6 AS DOUBLE) / 1000000.0)
           * (CAST(u6 AS DOUBLE) / 1000000.0)
           * 1000000) AS BIGINT)) AS BIGINT) AS q6
  FROM u{r}
),
v{r} AS MATERIALIZED (
  SELECT u{r}.i AS j,
         CASE WHEN q{r}.q6 > 0 THEN
           CAST(round(((CAST(u6 AS DOUBLE) / 1000000.0)
             / sqrt(CAST(q{r}.q6 AS DOUBLE) / 1000000.0))
             * 1000000) AS BIGINT)
         ELSE {v06} END AS v6
  FROM u{r}, q{r}
)""")
        prev = f"v{r}"
    chain = ",".join(rounds_sql)
    return f"""
WITH ex AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS x6
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
),
st AS (
  SELECT i, CAST(sum(x6) AS BIGINT) AS s6, count(*) AS n
  FROM ex GROUP BY i
),
ce AS (
  SELECT e.vec_id, e.i,
         (CAST(e.x6 AS DOUBLE) / 1000000.0)
           - ((CAST(st.s6 AS DOUBLE) / 1000000.0) / st.n) AS c
  FROM ex e JOIN st USING (i)
),
cv AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(sum(CAST(round(a.c * b.c * 1000000) AS BIGINT)) AS BIGINT)
           AS c6
  FROM ce a JOIN ce b USING (vec_id) GROUP BY a.i, b.i
),
nn AS (SELECT count(*) AS n FROM embeddings),
cd AS MATERIALIZED (
  SELECT i, j, (CAST(c6 AS DOUBLE) / 1000000.0) / nn.n AS cd
  FROM cv, nn
),
v0 AS (SELECT i AS j, CAST({v06} AS BIGINT) AS v6 FROM st),
{chain},
sg AS (
  SELECT CASE WHEN (SELECT v6 FROM v{rounds}
                    ORDER BY abs(v6) DESC, j ASC LIMIT 1) < 0
         THEN -1 ELSE 1 END AS sgn
),
tr AS (
  SELECT CAST(sum(CAST(round(cd * 1000000) AS BIGINT)) AS BIGINT) AS t6
  FROM cd WHERE i = j
),
ei AS (
  SELECT CASE WHEN q6 > 0
         THEN sqrt(CAST(q6 AS DOUBLE) / 1000000.0)
         ELSE 0.0 END AS eig
  FROM q{rounds}
),
vf AS (SELECT j, v6 FROM v{rounds})
"""


def embedding_pca(rounds: int = 8, dim: int = 64) -> str:
    """Oracle for pca.embedding_pca: the shared quantized
    power-iteration chain + the component/eigenvalue card."""
    mu = "(CAST(st.s6 AS DOUBLE) / 1000000.0) / st.n"
    return f"""
{_pca_ctes(rounds, dim)}
SELECT st.i,
       {micro6_sql(mu)} AS mean,
       CAST(sg.sgn * v.v6 AS DOUBLE) / 1000000.0 AS pc1,
       {micro6_sql("ei.eig")} AS eigval,
       CASE WHEN tr.t6 > 0 THEN
         {micro6_sql("ei.eig / (CAST(tr.t6 AS DOUBLE) / 1000000.0)")}
       ELSE 0.0 END AS explained_var
FROM st JOIN vf v ON st.i = v.j, sg, tr, ei
ORDER BY st.i
"""


def embedding_pca_scores(rounds: int = 8, dim: int = 64) -> str:
    """Oracle for pca.embedding_pca_scores: the shared fit chain + the
    quantized per-vector projection onto the signed component."""
    return f"""
{_pca_ctes(rounds, dim)},
mdl AS (
  SELECT st.i,
         (CAST(st.s6 AS DOUBLE) / 1000000.0) / st.n AS mu,
         CAST(sg.sgn * v.v6 AS DOUBLE) / 1000000.0 AS pc
  FROM st JOIN vf v ON st.i = v.j, sg
)
SELECT e.vec_id,
       CAST(CAST(sum(CAST(round(
         ((CAST(e.x6 AS DOUBLE) / 1000000.0) - m.mu) * m.pc * 1000000
       ) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
FROM ex e JOIN mdl m USING (i)
GROUP BY e.vec_id
ORDER BY e.vec_id
"""


def quality_classifier_pr_card(rounds: int = 4) -> str:
    """Oracle for quality_classifier.quality_classifier_pr_card: BOTH
    scores oracles nested verbatim as derived tables ('self' =
    in-sample card over the whole corpus; 'heldout' = the
    independently-trained head over only the held-out source's rows),
    re-quantized to integer microunits, cut at each threshold with
    exact integer counts per variant."""
    ths = ", ".join(str(t) for t in range(100_000, 1_000_000, 100_000))
    prec = micro6_sql("CAST(n_pos_kept AS DOUBLE) / n_kept")
    rec = micro6_sql("CAST(n_pos_kept AS DOUBLE) / n_pos")
    kr = micro6_sql("CAST(n_kept AS DOUBLE) / n_total")
    return f"""
WITH sc AS (
  SELECT 'self' AS variant, label,
         CAST(round(score * 1000000) AS BIGINT) AS p6
  FROM ({quality_classifier_scores(rounds)})
  UNION ALL
  SELECT 'heldout' AS variant, label,
         CAST(round(score * 1000000) AS BIGINT) AS p6
  FROM ({quality_classifier_indep_scores(rounds)})
  WHERE is_holdout = 1
),
tot AS (
  SELECT variant, count(*) AS n_total,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM sc GROUP BY variant
),
th AS (SELECT unnest([{ths}]) AS t6),
kept AS (
  SELECT variant, t6,
         CAST(sum(CASE WHEN p6 >= t6 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
         CAST(sum(CASE WHEN p6 >= t6 AND label = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos_kept
  FROM sc, th GROUP BY variant, t6
)
SELECT variant,
       CAST(t6 AS DOUBLE) / 1000000.0 AS threshold,
       n_kept, n_pos_kept,
       CASE WHEN n_kept > 0 THEN {prec} END AS precision,
       CASE WHEN n_pos > 0 THEN {rec} END AS recall,
       {kr} AS keep_rate
FROM kept JOIN tot USING (variant)
ORDER BY variant, threshold
"""


def _ulm_fwd_bwd(r: int, cost_cte: str, max_word: int = 16,
                 max_piece: int = 4, big: int = 10**15) -> str:
    """Forward Viterbi DP (unrolled positions 1..max_word) + backtrace
    CTEs for EM round tag `r` against cost CTE `cost_cte`; ends with
    u{r}(piece, usage) and pw{r}(word, npw)."""
    parts = [f""",
f{r}_0 AS MATERIALIZED (
  SELECT word, wl, n, CAST(0 AS BIGINT) AS best, 0 AS back FROM wcw)"""]
    for i in range(1, max_word + 1):
        branches = []
        for j in range(1, min(max_piece, i) + 1):
            branches.append(f"""
      SELECT f.word, f.wl, f.n,
             f.best + coalesce(c.cost6, {big}) AS tot, {j} AS j
      FROM f{r}_{i - j} f
      LEFT JOIN {cost_cte} c ON c.piece = substr(f.word, {i - j + 1}, {j})
      WHERE f.wl >= {i}""")
        u = "\n      UNION ALL".join(branches)
        parts.append(f""",
f{r}_{i} AS MATERIALIZED (
  SELECT word, wl, n, best, back FROM (
    SELECT q.word, q.wl, q.n, q.tot AS best, q.j AS back,
           row_number() OVER (
             PARTITION BY q.word ORDER BY q.tot ASC, q.j DESC) AS rn
    FROM ({u}
    ) q
  ) WHERE rn = 1
)""")
    fu = "\n  UNION ALL ".join(
        f"SELECT word, {i} AS pos, back FROM f{r}_{i}"
        for i in range(1, max_word + 1)
    )
    parts.append(f""",
fall{r} AS MATERIALIZED (
  {fu}
),
b{r}_0 AS MATERIALIZED (
  SELECT word, n, wl AS i, CAST(NULL AS VARCHAR) AS piece FROM wcw)""")
    for s in range(1, max_word + 1):
        parts.append(f""",
b{r}_{s} AS MATERIALIZED (
  SELECT b.word, b.n, b.i - f.back AS i,
         substr(b.word, b.i - f.back + 1, f.back) AS piece
  FROM b{r}_{s - 1} b JOIN fall{r} f ON f.word = b.word AND f.pos = b.i
  WHERE b.i > 0
)""")
    bu = "\n  UNION ALL ".join(
        f"SELECT word, n, piece FROM b{r}_{s}"
        for s in range(1, max_word + 1)
    )
    parts.append(f""",
ball{r} AS MATERIALIZED (
  {bu}
),
u{r} AS (SELECT piece, CAST(sum(n) AS BIGINT) AS usage
         FROM ball{r} GROUP BY piece),
pw{r} AS (SELECT word, CAST(count(*) AS BIGINT) AS npw
          FROM ball{r} GROUP BY word)""")
    return "".join(parts)


def _ulm_ctes(
    rounds: int = 2,
    max_word: int = 16,
    max_piece: int = 4,
    seed_multi: int = 64,
    prune_k: int = 16,
) -> str:
    """CTE chain for the unigram-LM tokenizer trainer
    (unigram_lm.unigram_lm_pieces): seed substring inventory, then
    `rounds` unrolled hard-EM rounds (E: integer-cost Viterbi over the
    word table, ties to the longer piece; M: usage re-count, bottom-k
    multi-char prune, add-one smoothing). Ends with k{rounds}(piece,
    cnt). The only libm call per round is ln() inside the cost
    quantization — identical arithmetic tree to the operator's
    _cost_map."""
    parts = [f"""wcw AS MATERIALIZED (
  SELECT word, length(word) AS wl, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE length(word) <= {max_word}
  GROUP BY word
),
sub AS (
  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
    SELECT w.n,
           unnest(flatten(list_transform(generate_series(1, w.wl), i ->
             list_transform(generate_series(1, least({max_piece},
                                                     w.wl - i + 1)),
                            j -> substr(w.word, i, j))))) AS piece
    FROM wcw w
  ) GROUP BY piece
),
seedr AS (
  SELECT piece, cnt,
         row_number() OVER (PARTITION BY (length(piece) > 1)
                            ORDER BY cnt DESC, piece ASC) AS r
  FROM sub
),
k0 AS MATERIALIZED (
  SELECT piece, cnt FROM seedr WHERE length(piece) = 1 OR r <= {seed_multi}
)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
t{r} AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM k{p}),
c{r} AS MATERIALIZED (
  SELECT piece,
         CAST(round(ln(t.tot / CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)
           AS cost6
  FROM k{p}, t{r} t
)""")
        parts.append(_ulm_fwd_bwd(r, f"c{r}", max_word, max_piece))
        parts.append(f""",
nm{r} AS (SELECT count(*) AS n_multi FROM k{p} WHERE length(piece) > 1),
mk{r} AS (
  SELECT k.piece,
         row_number() OVER (ORDER BY coalesce(u.usage, 0) DESC,
                            k.piece ASC) AS mr
  FROM k{p} k LEFT JOIN u{r} u ON u.piece = k.piece
  WHERE length(k.piece) > 1
),
k{r} AS MATERIALIZED (
  SELECT k.piece, CAST(coalesce(u.usage, 0) + 1 AS BIGINT) AS cnt
  FROM k{p} k LEFT JOIN u{r} u ON u.piece = k.piece
  WHERE length(k.piece) = 1
     OR k.piece IN (SELECT piece FROM mk{r}, nm{r}
                    WHERE mr <= greatest(n_multi - {prune_k}, 0))
)""")
    return "".join(parts)


def unigram_lm_pieces(rounds: int = 2) -> str:
    """Oracle for unigram_lm.unigram_lm_pieces: the identical unrolled
    hard-EM chain, emitting the final float-free piece table."""
    return f"""
WITH {_ulm_ctes(rounds=rounds)},
tf AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM k{rounds})
SELECT piece, CAST(length(piece) AS INT) AS piece_len, cnt,
       CAST(round(ln(t.tot / CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)
         AS cost_micro
FROM k{rounds}, tf t
ORDER BY piece
"""


def unigram_fertility(rounds: int = 2) -> str:
    """Oracle for unigram_lm fertility: one more Viterbi pass under the
    FINAL piece costs gives per-word piece counts; per-doc counts are a
    join (never a per-doc DP replay); per-source rollup with microunit
    fertility. Words over the length cap fall back to char count."""
    r = rounds + 1
    fert = micro6_sql("CAST(sum(o.occ * onp.npw) AS DOUBLE)"
                      " / sum(o.occ)")
    return f"""
WITH {_ulm_ctes(rounds=rounds)},
t{r} AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM k{rounds}),
c{r} AS MATERIALIZED (
  SELECT piece,
         CAST(round(ln(t.tot / CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)
           AS cost6
  FROM k{rounds}, t{r} t
){_ulm_fwd_bwd(r, f"c{r}")},
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
onp AS (
  SELECT o.doc_id, o.occ,
         coalesce(p.npw, length(o.word)) AS npw
  FROM occ o LEFT JOIN pw{r} p ON p.word = o.word
),
per_doc AS (
  SELECT doc_id,
         CAST(sum(occ) AS BIGINT) AS n_words,
         CAST(sum(occ * npw) AS BIGINT) AS n_pieces
  FROM onp GROUP BY doc_id
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(pd.n_words) AS BIGINT) AS n_words,
       CAST(sum(pd.n_pieces) AS BIGINT) AS n_pieces,
       {micro6_sql("CAST(sum(pd.n_pieces) AS DOUBLE) / sum(pd.n_words)")}
         AS fertility
FROM documents d JOIN per_doc pd USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


def _wp_ctes(n_merges: int = 8) -> str:
    """The unrolled WordPiece merge-round chain (operators/bpe.py
    _wp_chain): _bpe_ctes' machinery with the likelihood argmax — per
    round the pair maximizing round((ln(cnt)-ln(lc)-ln(rc))*1e6)
    (quantized log microunits, exact int64 compare; ties pair ASC)."""
    s = "chr(31)"
    b = "(chr(31) || chr(31))"
    parts = [
        f"""
w0 AS MATERIALIZED (
  SELECT word, count(*) AS wc,
         {b} || array_to_string(
           list_filter(string_split(word, ''), c -> length(c) > 0), {b}
         ) || {b} AS repr
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, {s})
  GROUP BY word
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(f""",
sy{r} AS MATERIALIZED (
  SELECT sym, sum(wc) AS sc FROM (
    SELECT wc, unnest(
      (string_split(repr, {b}))[2:len(string_split(repr, {b})) - 1]
    ) AS sym
    FROM w{p}
  ) GROUP BY 1
),
p{r} AS MATERIALIZED (
  SELECT pr.l AS lhs, pr.r AS rhs, sum(wc) AS cnt
  FROM (
    SELECT wc,
           unnest(list_transform(generate_series(1, len(syms) - 1),
                  i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS pr
    FROM (SELECT wc, (string_split(repr, {b}))[2:len(string_split(repr, {b})) - 1]
                 AS syms
          FROM w{p})
  )
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT p.lhs, p.rhs, p.cnt,
         CAST(round((ln(CAST(p.cnt AS DOUBLE))
                     - ln(CAST(l.sc AS DOUBLE))
                     - ln(CAST(r2.sc AS DOUBLE))) * 1000000) AS BIGINT)
           AS score_micro
  FROM p{r} p
  JOIN sy{r} l ON l.sym = p.lhs
  JOIN sy{r} r2 ON r2.sym = p.rhs
  ORDER BY score_micro DESC, p.lhs ASC, p.rhs ASC LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT word, wc,
         CASE WHEN lhs IS NULL THEN repr
              ELSE replace(repr, {s} || lhs || {b} || rhs || {s},
                           {s} || lhs || rhs || {s}) END AS repr
  FROM w{p} LEFT JOIN b{r} ON TRUE
)""")
    return "".join(parts)


def wordpiece_merges(n_merges: int = 8) -> str:
    """Oracle for bpe.wordpiece_merges: the unrolled likelihood-argmax
    merge chain, emitting each round's winner (float-free)."""
    sel = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, lhs AS left_sym, rhs AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count, score_micro FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH {_wp_ctes(n_merges)}
{sel}
ORDER BY merge_round
"""


def wordpiece_doc_tokens(n_merges: int = 8) -> str:
    """Oracle for bpe.wordpiece_doc_tokens: occurrences joined against
    the WordPiece-trained word table's symbol counts."""
    b = "(chr(31) || chr(31))"
    return f"""
WITH {_wp_ctes(n_merges)},
seg AS (
  SELECT word,
         len(string_split(repr, {b})) - 2 AS n_syms
  FROM w{n_merges}
),
occ AS (
  SELECT doc_id, word, count(*) AS occ FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> length(t) > 0)) AS word
    FROM documents
  )
  WHERE NOT contains(word, chr(31))
  GROUP BY 1, 2
)
SELECT o.doc_id,
       CAST(sum(o.occ) AS BIGINT) AS n_words,
       CAST(sum(o.occ * s.n_syms) AS BIGINT) AS n_wp_tokens
FROM occ o JOIN seg s USING (word)
GROUP BY o.doc_id
ORDER BY o.doc_id
"""


def wordpiece_fertility(n_merges: int = 8) -> str:
    """Oracle for bpe.wordpiece_fertility: the wordpiece_doc_tokens
    chain rolled up per source (bpe_fertility's emission contract)."""
    fert = micro6_sql("CAST(sum(t.n_wp_tokens) AS DOUBLE) / sum(t.n_words)")
    return f"""
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(t.n_words) AS BIGINT) AS n_words,
       CAST(sum(t.n_wp_tokens) AS BIGINT) AS n_wp_tokens,
       {fert} AS fertility
FROM ({wordpiece_doc_tokens(n_merges)}) t
JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


def tokenizer_compare(n_merges: int = 8, rounds: int = 2) -> str:
    """Oracle for bpe.tokenizer_compare: the three fertility oracles
    UNION ALL'd under a family tag, ordered (source, family)."""
    return f"""
SELECT source, 'bpe' AS family, n_docs, n_words,
       n_bpe_tokens AS n_tokens, fertility
FROM ({bpe_fertility(n_merges)})
UNION ALL
SELECT source, 'unigram' AS family, n_docs, n_words,
       n_pieces AS n_tokens, fertility
FROM ({unigram_fertility(rounds)})
UNION ALL
SELECT source, 'wordpiece' AS family, n_docs, n_words,
       n_wp_tokens AS n_tokens, fertility
FROM ({wordpiece_fertility(n_merges)})
ORDER BY source, family
"""


def doremi_weights(eta: float = 1.0, eps: float = 0.1) -> str:
    """Oracle for curation.doremi_weights: per-doc excess on the two LM
    oracles' quantized emissions (exact int64), per-source mean from an
    exact integer sum, one EG step with each exp() re-quantized before
    the normalization sum — the identical arithmetic tree."""
    ex = micro6_sql(
        "CAST(s6 AS DOUBLE) / (1000000.0 * CAST(n_docs AS DOUBLE))"
    )
    w = micro6_sql(
        f"{1.0 - eps!r} * (CAST(x6 AS DOUBLE) / t.tx) + {eps!r} / t.k"
    )
    return f"""
WITH uq AS (
  SELECT doc_id, CAST(round(logppl * 1000000) AS BIGINT) AS u6
  FROM ({unigram_logppl()})
),
bq AS (
  SELECT doc_id, CAST(round(logppl * 1000000) AS BIGINT) AS b6
  FROM ({bigram_logppl()})
),
pd AS (
  SELECT doc_id, greatest(u6 - b6, 0) AS e6
  FROM uq JOIN bq USING (doc_id)
),
agg AS (
  SELECT d.source, count(*) AS n_docs, CAST(sum(e6) AS BIGINT) AS s6
  FROM documents d JOIN pd USING (doc_id)
  GROUP BY 1
),
ex AS (
  SELECT source, n_docs, {ex} AS excess_logppl FROM agg
),
x AS (
  SELECT source, n_docs, excess_logppl,
         CAST(round(exp({float(eta)!r} * excess_logppl) * 1000000)
              AS BIGINT) AS x6
  FROM ex
),
t AS (
  SELECT CAST(sum(x6) AS DOUBLE) AS tx,
         CAST(count(*) AS DOUBLE) AS k
  FROM x
)
SELECT source, n_docs, excess_logppl, {w} AS doremi_weight
FROM x, t
ORDER BY source
"""


def zipf_ttr_card(top_k: int = 100) -> str:
    """Oracle for textstats.zipf_ttr_card: per-source TTR + fitted Zipf
    exponent — the same whitespace tokenize, deterministic (freq DESC,
    word ASC) ranks, quantized ln() microunits, exact integer regression
    sums, and the one fixed IEEE closed-form slope."""
    ttr = micro6_sql("CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)")
    denom = (
        "(CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    slope = micro6_sql(
        "(CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " + denom
    )
    return f"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS w
  FROM documents
),
cnt AS (SELECT source, w, count(*) AS freq FROM tok GROUP BY source, w),
totals AS (
  SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnt GROUP BY source
),
ranked AS (
  SELECT source,
         CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x6,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y6
  FROM (
    SELECT source, freq,
           row_number() OVER (
             PARTITION BY source ORDER BY freq DESC, w ASC) AS rank
    FROM cnt
  )
  WHERE rank <= {top_k}
),
reg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(x6) AS BIGINT) AS sx,
         CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx
  FROM ranked GROUP BY source
)
SELECT t.source, t.n_tokens, t.n_types,
       {ttr} AS ttr,
       CASE WHEN {denom} > 0 THEN {slope} END AS zipf_slope
FROM totals t JOIN reg USING (source)
ORDER BY t.source
"""
