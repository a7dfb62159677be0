"""Text-analysis operators for large-scale training-data pipelines:
language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting. All JVM-side column expressions over the
documents table — a narrow map over the scan, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.emit import micro6
from ..functions.text import LANG_MARKERS, quality_features
from ..io import fan_out


def _ws_tokens(text: Column) -> Column:
    toks = F.split(F.lower(text), "\\s+")
    return F.filter(toks, lambda t: F.length(t) > 0)


# GPT-2-ish pre-tokenizer classes: letter runs, single digits, single
# punctuation marks (whitespace is never a token). Same RE2/Java-regex
# semantics in both engines.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace split count plus the
    BPE-ish regex count (letter runs / digits / punctuation marks). Both
    are single regexp passes inside whole-stage codegen."""
    t = F.col(text_col)
    return fan_out(docs).select(
        F.col(id_col),
        F.size(_ws_tokens(t)).alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("int").alias("bpe_tokens"),
    )


def duckdb_token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INT) AS bpe_tokens
FROM documents
"""


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit count per language (n-gram heuristic's word level)."""
    toks = _ws_tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def lang_pred_col(text: Column) -> Column:
    """The language-ID prediction as a single column expression: argmax
    of the marker counts, ties broken by language code ascending
    (deterministic). THE one definition of the fold — lang_id and any
    report embedding the prediction (e.g. the corpus data card) must
    consume this helper so a tie-break or scoring change lands in every
    caller and its oracle together."""
    scores = lang_scores(text)
    langs = sorted(scores)
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    return pred


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — argmax of marker counts; ties broken by
    language code ascending (deterministic)."""
    return fan_out(docs).select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("lang_pred")
    )


def quality_col(text: Column) -> Column:
    """The unrounded quality score as a single column expression:
    0.5*stopword_ratio + 0.5*(1 - punct_ratio), halved below 20 tokens.
    Shared by quality_score and report-style callers for the same
    single-definition reason as lang_pred_col."""
    feats = quality_features(text)
    base = 0.5 * feats["stopword_ratio"] + 0.5 * (1.0 - feats["punct_ratio"])
    return F.when(feats["n_tokens"] < 20, base * 0.5).otherwise(base)


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, mean_word_len, quality)
    — quality = clamp01(0.5*stopword_ratio + 0.5*(1 - punct_ratio))
    shifted by a length prior (docs under 20 tokens get halved)."""
    feats = quality_features(F.col(text_col))
    quality = quality_col(F.col(text_col))
    return fan_out(docs).select(
        F.col(id_col),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["mean_word_len"], 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
    )


# Gopher-style quality-filter constants (Rae et al. 2021, appendix A —
# public). Thresholds are the published ones; the symbol set is '#' plus
# ellipsis (ASCII and Unicode).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_SYMBOL_RE = "#|\\.\\.\\.|…"
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_5GRAM_MAX = 0.15


def _word_ngrams(words: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams; empty when < n words.
    The sequence bound is guarded because Spark's sequence(1, 0) yields a
    DESCENDING [1, 0], not an empty array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def gopher_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, A1.2): per document the
    duplicate-word fraction, the top word-n-gram character fraction for
    n=2,3,4 (count of the most frequent n-gram × its character length /
    total characters; ties broken by lexicographically smallest gram), a
    simplified duplicate-5-gram character fraction (characters of all
    occurrences of 5-grams appearing ≥2×, overlap-unaware, capped at 1),
    and the pass flag against the published thresholds.

    Scale shape: n-gram explode → map-side-combined count on
    (doc_id, n, gram) → per-(doc, n) min-struct top pick → pivot, then one
    doc-keyed equi-join back to the base stats. No driver collects, no
    broadcast of anything document-sized; the shuffle key includes the
    gram so hot documents don't make hot partitions."""
    t = F.col(text_col)
    words = _ws_tokens(t)
    base = fan_out(docs).select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        words.alias("words"),
    )
    def _tag(n: int):
        # NB: must stay a ONE-argument callable — F.transform treats a
        # two-arg lambda as (element, index) and would bind n to the index.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    gram_structs = F.concat(
        *[
            F.transform(_word_ngrams(F.col("words"), n), _tag(n))
            for n in (2, 3, 4, 5)
        ]
    )
    exploded = base.select(
        F.col(id_col), "n_chars", F.explode(gram_structs).alias("g")
    ).select(F.col(id_col), "n_chars", F.col("g.n").alias("n"), F.col("g.gram"))
    cnts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("n_chars").alias("n_chars")
    )
    stats = cnts.groupBy(id_col, "n").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram"))).alias("m"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dup_chars"),
        F.first("n_chars").alias("n_chars"),
    )
    fracs = stats.select(
        F.col(id_col),
        "n",
        F.round(
            (-F.col("m.neg")) * F.length("m.gram") / F.greatest("n_chars", F.lit(1)),
            6,
        ).alias("top_frac"),
        F.round(
            F.least(
                F.col("dup_chars") / F.greatest("n_chars", F.lit(1)), F.lit(1.0)
            ),
            6,
        ).alias("dup_frac"),
    )
    piv = (
        fracs.groupBy(id_col)
        .pivot("n", [2, 3, 4, 5])
        .agg(F.first("top_frac").alias("top"), F.first("dup_frac").alias("dup"))
    )
    out = base.drop("words").join(piv, id_col, "left")
    top = {n: F.coalesce(F.col(f"{n}_top"), F.lit(0.0)) for n in (2, 3, 4)}
    dup5 = F.coalesce(F.col("5_dup"), F.lit(0.0))
    passes = (
        (top[2] <= GOPHER_TOP_NGRAM_MAX[2])
        & (top[3] <= GOPHER_TOP_NGRAM_MAX[3])
        & (top[4] <= GOPHER_TOP_NGRAM_MAX[4])
        & (dup5 <= GOPHER_DUP_5GRAM_MAX)
    )
    return out.select(
        F.col(id_col),
        F.round(
            (F.col("n_words") - F.col("n_distinct"))
            / F.greatest("n_words", F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        top[2].alias("top2gram_char_frac"),
        top[3].alias("top3gram_char_frac"),
        top[4].alias("top4gram_char_frac"),
        dup5.alias("dup5gram_char_frac"),
        passes.alias("repetition_pass"),
    )


def gopher_quality_exprs(text_col: str = "text") -> dict:
    """The Gopher-quality columns as a name → expression dict over a
    single projection — THE one definition, shared by gopher_quality and
    curation_funnel so the funnel can fuse all per-row gates into one
    scan instead of a doc_id join per gate (r13, guide §2.3). Values
    are identical to the former two-stage select: the pass flags read
    the same rounded expressions the stat columns carry."""
    t = F.col(text_col)
    words = _ws_tokens(t)
    n_words = F.size(words)
    denom = F.greatest(n_words, F.lit(1))
    mwl = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast(
            "double"
        )
        / denom,
        6,
    )
    swr = F.round(
        F.regexp_count(t, F.lit(GOPHER_SYMBOL_RE)).cast("double") / denom, 6
    )
    faw = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
        / denom,
        6,
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(stop_arr, lambda s: F.array_contains(words, s)))
    pass_wc = n_words.between(50, 100000)
    pass_mwl = mwl.between(3.0, 10.0)
    pass_sym = swr < 0.1
    pass_alpha = faw > 0.8
    pass_stop = n_stop >= 2
    return {
        "n_words": n_words,
        "mean_word_len": mwl,
        "symbol_word_ratio": swr,
        "frac_alpha_words": faw,
        "stopwords_present": n_stop,
        "pass_word_count": pass_wc,
        "pass_mean_word_len": pass_mwl,
        "pass_symbol_ratio": pass_sym,
        "pass_alpha_words": pass_alpha,
        "pass_stopwords": pass_stop,
        "keep": pass_wc & pass_mwl & pass_sym & pass_alpha & pass_stop,
    }


def gopher_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher quality filters (Rae et al. 2021, A1.1) as pure column
    expressions — word-count bounds [50, 100k], mean word length [3, 10],
    symbol-to-word ratio < 0.1, >80% words containing an alphabetic char,
    ≥2 distinct required stopwords — plus the per-rule booleans and the
    conjunction `keep`. Shuffle-free: a narrow map over the scan."""
    ex = gopher_quality_exprs(text_col)
    return fan_out(docs).select(
        F.col(id_col), *[v.alias(k) for k, v in ex.items()]
    )


def unigram_logppl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, logppl) — CCNet-style LM quality scoring with a
    deterministic corpus-trained unigram model (the honest stand-in for
    the neural-perplexity path, which needs a model runtime this
    environment lacks): add-one-smoothed p(w) = (c_w + 1)/(N + V) over
    the whole corpus, logppl = -mean ln p(w) per document. Lower = more
    typical of the corpus; CCNet keeps the low-perplexity head.

    Scale shape: token explode → map-side-combined unigram counts →
    probability join back on the word key → per-doc average. The N/V
    totals come from an unpartitioned window over the UNIGRAM table (the
    vocabulary, bounded and tiny relative to the corpus), never over the
    token stream. Docs with zero tokens have no perplexity and are
    absent from the output (same in the oracle)."""
    from pyspark.sql import Window

    tok = fan_out(docs).select(
        F.col(id_col), F.explode(_ws_tokens(F.col(text_col))).alias("w")
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    w_all = Window.partitionBy()
    p = uni.select(
        "w",
        (
            (F.col("c") + F.lit(1.0))
            / (F.sum("c").over(w_all) + F.count(F.lit(1)).over(w_all))
        ).alias("pw"),
    )
    return (
        tok.join(p, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(-F.avg(F.log("pw")), 6).alias("logppl"),
        )
    )


def gopher_gate_expr(text: Column, require_stopwords: bool = False) -> Column:
    """One boolean column applying the Gopher quality gates to `text` —
    the shuffle-free predicate form for use inside streaming micro-batches
    (ingest.process_batch's opt-in quality gate) or as a pushed filter.
    Same rules as gopher_quality but compared unrounded (a gate, not a
    report); the stopword rule is opt-in for synthetic/code corpora."""
    words = _ws_tokens(text)
    n_words = F.size(words)
    denom = F.greatest(n_words, F.lit(1))
    mwl = (
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast(
            "double"
        )
        / denom
    )
    swr = F.regexp_count(text, F.lit(GOPHER_SYMBOL_RE)).cast("double") / denom
    faw = (
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
        / denom
    )
    gate = (
        n_words.between(50, 100000)
        & mwl.between(3.0, 10.0)
        & (swr < 0.1)
        & (faw > 0.8)
    )
    if require_stopwords:
        stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        n_stop = F.size(F.filter(stop_arr, lambda s: F.array_contains(words, s)))
        gate = gate & (n_stop >= 2)
    return gate


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) — 16-hex-char content fingerprint of the normalized text
    (lowercased, whitespace collapsed). The md5 prefix is the distributed
    analog of the reference's content-hash dedup key (file_hash,
    chunk_embed/payload.rs)."""
    return fan_out(docs).select(
        F.col(id_col), fingerprint_expr(text_col).alias("fp")
    )


def fingerprint_expr(text_col: str = "text"):
    """The fingerprint column expression alone (shared with
    curation_funnel's fused single-scan shape, r13)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return F.substring(F.md5(norm.cast("binary")), 1, 16)




# Pack width for the (hash, pos) -> int64 winnowing key: positions must
# stay below this or they alias into the hash bits. Module-level so the
# guard is testable without a 2^20-char fixture document.
WINNOWING_PACK_POS = 1 << 20


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp) — winnowing fingerprint selection (Schleimer,
    Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS algorithm): hash every char k-gram and
    select, for every window of `window` consecutive hashes, that
    window's minimum (leftmost position on hash ties — the paper uses
    rightmost; either satisfies the winnowing guarantee, the tie side is
    pinned for oracle parity). Guarantee: any substring of length >=
    k + window - 1 shared by two documents produces a shared selected
    fingerprint — the local, position-robust plagiarism/dedup signal a
    global content hash (`fingerprint`) cannot give. Documents shorter
    than k select nothing; documents with fewer than `window` grams are
    one truncated window (whole-doc min).

    Plan: k-gram posexplode → nonneg 32-bit md5-derived hash → the
    (hash, pos) pair packed into ONE int64 key (h * 2^20 + pos — exact
    while docs stay under 2^20 chars) → a single forward rows-window min
    per window start → distinct decode. All JVM-side window work
    partitioned by doc; selected density ~2/(window+1) of positions
    bounds the output."""
    from pyspark.sql.window import Window as W

    from ..functions.hashing import md5_hash64

    m = 1 << 32
    pk = WINNOWING_PACK_POS
    grams = fan_out(docs).select(
        F.col(id_col),
        F.posexplode(
            # CASE guard: sequence(1, 0) is DESCENDING [1, 0] in Spark,
            # so short docs must produce an empty array, not bogus grams
            F.expr(
                f"CASE WHEN length({text_col}) >= {k} THEN "
                f"transform(sequence(1, length({text_col}) - {k - 1}),"
                f" i -> substring({text_col}, i, {k})) "
                f"ELSE array() END"
            )
        ).alias("pos0", "g"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        (
            ((md5_hash64(F.col("g")) % F.lit(m)) + F.lit(m)) % F.lit(m)
        ).alias("h"),
    )
    keyed = grams.select(
        id_col,
        "pos",
        # enforce the pack-width precondition: a pos >= 2^20 would alias
        # into the hash bits and silently corrupt every fingerprint of
        # that document — oversized docs must fail visibly instead
        # (ADVICE r5). Widening the pack is the fix if such docs are
        # expected; the corpus contract here is chunked docs << 1M chars.
        F.when(
            F.col("pos") < F.lit(pk),
            F.col("h") * F.lit(pk) + F.col("pos"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "winnowing_fingerprints: document position exceeds "
                        f"the 2^20 pack width (doc "
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(", pos "),
                    F.col("pos").cast("string"),
                    F.lit(") — chunk the document or widen the pack"),
                )
            ).cast("long")
        )
        .alias("key"),
    )
    part = W.partitionBy(id_col)
    fwd = part.orderBy("pos").rowsBetween(W.currentRow, window - 1)
    return (
        keyed.withColumn("n_g", F.count(F.lit(1)).over(part))
        .withColumn("wkey", F.min("key").over(fwd))
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n_g") - F.lit(window - 1), F.lit(1))
        )
        .select(
            id_col,
            (F.col("wkey") % F.lit(pk)).alias("pos"),
            # integer div, not floor(double /): exact for all key widths
            F.expr(f"wkey div {pk}").alias("fp"),
        )
        .distinct()
    )


def bigram_logppl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, logppl) — bigram conditional-LM quality score,
    one step closer to CCNet's 5-gram KenLM than `unigram_logppl`:
    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) with add-one smoothing
    over the corpus unigram vocabulary V; logppl = -mean ln p over the
    document's bigrams. Lower = more typical word TRANSITIONS (the
    signal n-gram LMs add over bag-of-words). Docs with < 2 tokens have
    no bigram and are absent, like the unigram twin.

    Plan: ONE bigram explode feeding the bigram count table; the
    context table c(w1 ·) is a second aggregate OF THE COUNT TABLE (not
    a second corpus scan); V comes from a window over the context table
    (bounded vocabulary). Joins key on the bigram / its first word —
    word-count shapes throughout."""
    from pyspark.sql import Window

    bg_expr = (
        f"CASE WHEN size(__toks) >= 2 THEN "
        f"transform(sequence(1, size(__toks) - 1),"
        f" i -> concat_ws(' ', element_at(__toks, i), element_at(__toks, i + 1))) "
        f"ELSE array() END"
    )
    bg = (
        fan_out(docs)
        .withColumn("__toks", _ws_tokens(F.col(text_col)))
        .select(F.col(id_col), F.explode(F.expr(bg_expr)).alias("bg"))
    )
    cnt = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = cnt.withColumn(
        "w1", F.substring_index("bg", " ", 1)
    ).groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    # V = corpus unigram vocabulary (all tokens, incl. doc-final ones)
    uni = (
        fan_out(docs)
        .select(F.explode(_ws_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_all = Window.partitionBy()
    vtab = uni.select(
        F.count(F.lit(1)).over(w_all).alias("v")
    ).limit(1)
    p = (
        cnt.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vtab))
        .select(
            "bg",
            (
                (F.col("c_bg") + F.lit(1.0))
                / (F.col("c_ctx") + F.col("v"))
            ).alias("pw"),
        )
    )
    return (
        bg.join(p, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(-F.avg(F.log("pw")), 6).alias("logppl"),
        )
    )


def _ngram_expr(n: int) -> str:
    """SQL for the space-joined whitespace word n-gram array (empty
    below n tokens) — the ONE definition of the LM ops' explode."""
    parts = ", ".join(f"element_at(__toks, i + {k})" if k else
                      "element_at(__toks, i)" for k in range(n))
    return (
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
    )


def _ngram_stream(
    docs: DataFrame,
    n: int,
    id_col: str | None = "doc_id",
    text_col: str = "text",
    out_col: str = "bg",
) -> DataFrame:
    """(id, <out_col>) — the whitespace word n-gram explode every LM op
    shares; id_col=None drops the id (model training needs only the
    stream)."""
    t = fan_out(docs).withColumn("__toks", _ws_tokens(F.col(text_col)))
    g = F.explode(F.expr(_ngram_expr(n))).alias(out_col)
    if id_col is None:
        return t.select(g)
    return t.select(F.col(id_col), g)


def _bigram_stream(
    docs: DataFrame,
    id_col: str | None = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    return _ngram_stream(docs, 2, id_col, text_col)


def _kn_tables(bg: DataFrame):
    """The Kneser-Ney count tables from a bigram stream: (cnt with
    w1/w2 split out, ctx = c(w1 .)/N1+(w1 .), bwd = N1+(. w2),
    tot = N1+(. .)) — each an aggregate OF the count table, never a
    second corpus scan."""
    cnt = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .select(
            "bg",
            "c_bg",
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
        )
    )
    ctx = cnt.groupBy("w1").agg(
        F.sum("c_bg").alias("c_ctx"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    bwd = cnt.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    tot = cnt.agg(F.count(F.lit(1)).alias("n_types"))
    return cnt, ctx, bwd, tot


def _kn_pw(discount: float):
    """p_KN(w2|w1) as one fixed IEEE expression over the joined count
    tables — mirrored token-for-token in the oracle SQL."""
    return (
        F.greatest(
            F.col("c_bg").cast("double") - F.lit(float(discount)), F.lit(0.0)
        )
        / F.col("c_ctx")
    ) + (
        (F.lit(float(discount)) * F.col("n1_fwd") / F.col("c_ctx"))
        * (F.col("n1_bwd").cast("double") / F.col("n_types"))
    )


def _kn3_tables(tg: DataFrame):
    """The order-3 Kneser-Ney count tables from a trigram stream:
    (t3 with w12/w2/w3 split out, ctx3 = c(w1w2 .)/N1+(w1w2 .),
    mid = continuation bigram counts c'(w2w3) = N1+(. w2w3),
    ctx2 = c'(w2 .)/N1+'(w2 .), low = c''(w3), tot = N1+(. . .)) —
    the middle and lowest orders run on CONTINUATION counts derived
    FROM the trigram table (the Kneser-Ney move); every table is an
    aggregate of the count table, never a second corpus scan."""
    t3 = (
        tg.groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c3"))
        .select(
            "tg",
            "c3",
            F.substring_index("tg", " ", 2).alias("w12"),
            F.substring_index(
                F.substring_index("tg", " ", 2), " ", -1
            ).alias("w2"),
            F.substring_index("tg", " ", -1).alias("w3"),
        )
    )
    ctx3 = t3.groupBy("w12").agg(
        F.sum("c3").alias("c_ctx3"),
        F.count(F.lit(1)).alias("n1f3"),
    )
    mid = t3.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).alias("c2p")
    )
    ctx2 = mid.groupBy("w2").agg(
        F.sum("c2p").alias("c_ctx2"),
        F.count(F.lit(1)).alias("n1f2"),
    )
    low = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("c1p"))
    tot = mid.agg(F.count(F.lit(1)).alias("n_types"))
    return t3, ctx3, mid, ctx2, low, tot


def _kn3_p2(discount: float):
    """p2(w3|w2) — the middle-order KN term over continuation counts,
    one fixed IEEE expression (shared by training and the serving
    scorer's backoff branch; mirrored token-for-token in the oracle)."""
    d = F.lit(float(discount))
    p1 = F.col("c1p").cast("double") / F.col("n_types")
    return (
        F.greatest(F.col("c2p").cast("double") - d, F.lit(0.0))
        / F.col("c_ctx2")
    ) + ((d * F.col("n1f2") / F.col("c_ctx2")) * p1)


def _kn3_p3(discount: float):
    """p3(w3|w1 w2) as one fixed IEEE expression, innermost-first
    (p1 -> p2 -> p3), over the joined _kn3_tables columns."""
    d = F.lit(float(discount))
    return (
        F.greatest(F.col("c3").cast("double") - d, F.lit(0.0))
        / F.col("c_ctx3")
    ) + ((d * F.col("n1f3") / F.col("c_ctx3")) * _kn3_p2(discount))


def kn_bigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(doc_id, n_bigrams, logppl) — interpolated KNESER-NEY bigram LM,
    the smoothing family KenLM actually implements and CCNet's
    perplexity filter actually uses (Kneser & Ney 1995; Chen & Goodman
    1998 eq. 4.25; Wenzek et al. 2020) — the next rung of the LM ladder
    above `bigram_logppl`'s add-one:

        p_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 ·)
                      + D · N1+(w1 ·)/c(w1 ·) · p_cont(w2)
        p_cont(w2)  = N1+(· w2) / N1+(· ·)

    with absolute discount D = `discount` (Chen & Goodman's fixed 0.75).
    The continuation probability scores w2 by how many distinct contexts
    it FOLLOWS, not raw frequency — the fix for "Francisco is frequent
    but only ever follows San". logppl = -mean ln p_KN over the doc's
    bigrams; scoring is over corpus bigrams so every bigram has count
    >= 1 (no OOV branch needed). Docs with < 2 tokens are absent, like
    the add-one twin.

    Emission discipline: ln() is the only libm call — its output is
    quantized to int64 microunits per bigram (the doremi_weights
    pattern), the per-doc mean is an EXACT integer sum over a bigint
    count, and the final division is one fixed IEEE expression, so the
    report hashes bit-identically in any engine.

    Plan shape: ONE bigram explode feeds the count table; the context
    table c(w1 ·)/N1+(w1 ·), the continuation table N1+(· w2), and the
    type total are all aggregates OF THE COUNT TABLE (never a second
    corpus scan); probability joins key on single words against bounded
    vocab-sized tables; the type total is a 1-row broadcast."""
    bg = _bigram_stream(docs, id_col, text_col)
    cnt, ctx, bwd, tot = _kn_tables(bg)
    pw = _kn_pw(discount)
    q = (
        cnt.join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.round(F.log(pw) * F.lit(1e6)).cast("long").alias("lq"),
        )
    )
    return (
        bg.join(q, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("lq").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            micro6(
                -(F.col("_s").cast("double") / F.lit(1e6))
                / F.col("n_bigrams")
            ).alias("logppl"),
        )
    )



def kn_trigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(doc_id, n_trigrams, logppl) — interpolated Kneser-Ney TRIGRAM
    LM (Chen & Goodman 1998 eq. 4.28-4.30, the full lower-order
    continuation-count recursion — the order-3 slice of what KenLM
    builds at order 5), completing the LM ladder above the KN bigram:

        p3(w3|w1 w2) = max(c(w1w2w3) - D, 0)/c(w1w2 .)
                       + D N1+(w1w2 .)/c(w1w2 .) p2(w3|w2)
        p2(w3|w2)    = max(c'(w2w3) - D, 0)/c'(w2 .)
                       + D N1+'(w2 .)/c'(w2 .) p1(w3)
        p1(w3)       = c''(w3) / N1+(. . .)

    where the MIDDLE order runs on continuation counts c'(w2w3) =
    N1+(. w2w3) (distinct w1 preceding the bigram — derived FROM the
    trigram table, the Kneser-Ney move) and the lowest on c''(w3) =
    distinct w2 with c'(w2w3) > 0. Scoring is over corpus trigrams so
    every trigram is seen; docs with < 3 tokens are absent. Same
    emission discipline as the bigram: ln() quantized to int64
    microunits per trigram, exact integer per-doc sums, one fixed IEEE
    expression mirrored token-for-token in the oracle.

    Plan shape: ONE trigram explode feeds the count table; the context
    (w1w2), middle (w2w3), middle-context (w2), lowest (w3) and type
    tables are ALL aggregates of the count table — five vocab-scale
    rollups, never a second corpus scan; the type total is a 1-row
    broadcast."""
    tg = _ngram_stream(docs, 3, id_col, text_col, out_col="tg")
    t3, ctx3, mid, ctx2, low, tot = _kn3_tables(tg)
    p3 = _kn3_p3(discount)
    q = (
        t3.join(ctx3, "w12")
        .join(mid, ["w2", "w3"])
        .join(ctx2, "w2")
        .join(low, "w3")
        .crossJoin(F.broadcast(tot))
        .select(
            "tg",
            F.round(F.log(p3) * F.lit(1e6)).cast("long").alias("lq"),
        )
    )
    return (
        tg.join(q, "tg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_trigrams"),
            F.sum("lq").alias("_s"),
        )
        .select(
            id_col,
            "n_trigrams",
            micro6(
                -(F.col("_s").cast("double") / F.lit(1e6))
                / F.col("n_trigrams")
            ).alias("logppl"),
        )
    )


def kn_bigram_model(
    docs: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """The FROZEN Kneser-Ney bigram model as one persistable long-format
    table — the artifact CCNet-style filtering trains ONCE on a
    reference corpus and then serves against every new document (Wenzek
    et al. 2020 train KenLM on Wikipedia and score Common Crawl with
    it; this is that split made explicit). Rows by `kind`:

      kind='bg'   bg, a = ln p_KN(w2|w1) quantized to int64 microunits
                  (seen bigrams — the fully trained path)
      kind='ctx'  w1, a = c(w1 ·), b = N1+(w1 ·)   (backoff factors)
      kind='cont' w2, a = N1+(· w2)                (continuation counts)
      kind='tot'  a = N1+(· ·)                     (bigram type total)

    Raw counts — not precomputed backoff probabilities — are stored for
    the ctx/cont/tot kinds so the scorer recomputes the interpolation
    term in one fixed IEEE expression (engine-identical floats). The
    table is bounded by the reference corpus's bigram-type count: a
    model artifact, not a data table."""
    bg = _bigram_stream(docs, None, text_col)
    cnt, ctx, bwd, tot = _kn_tables(bg)
    pw = _kn_pw(discount)
    nul = F.lit(None).cast("string")
    nulb = F.lit(None).cast("long")
    bg_rows = (
        cnt.join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit("bg").alias("kind"),
            F.col("bg"),
            nul.alias("w1"),
            nul.alias("w2"),
            F.round(F.log(pw) * F.lit(1e6)).cast("long").alias("a"),
            nulb.alias("b"),
        )
    )
    ctx_rows = ctx.select(
        F.lit("ctx").alias("kind"), nul.alias("bg"), "w1",
        nul.alias("w2"), F.col("c_ctx").alias("a"),
        F.col("n1_fwd").alias("b"),
    )
    cont_rows = bwd.select(
        F.lit("cont").alias("kind"), nul.alias("bg"), nul.alias("w1"),
        "w2", F.col("n1_bwd").alias("a"), nulb.alias("b"),
    )
    tot_rows = tot.select(
        F.lit("tot").alias("kind"), nul.alias("bg"), nul.alias("w1"),
        nul.alias("w2"), F.col("n_types").alias("a"), nulb.alias("b"),
    )
    return (
        bg_rows.unionByName(ctx_rows)
        .unionByName(cont_rows)
        .unionByName(tot_rows)
    )


def kn_score_with(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(doc_id, n_bigrams, n_backoff, n_oov, logppl) — score documents
    under a FROZEN kn_bigram_model: the out-of-sample/serving half of
    kn_bigram_logppl (train-on-reference, score-the-stream — CCNet's
    actual deployment shape; at 100 TB new documents are scored as they
    arrive against the bounded model artifact, never by retraining).
    Three branches per scored bigram:

      seen bigram      -> the model's quantized ln p_KN       (n = exact)
      seen w1 AND w2   -> interpolation weight x continuation:
                          ln( D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··) )
                          (the KN backoff term alone)         (n_backoff)
      unseen w1 or w2  -> uniform unk floor ln(1/(N1+(··)+1)) (n_oov)

    Every branch is quantized to int64 microunits at its single ln()
    call; the per-doc mean is an exact integer sum (the
    kn_bigram_logppl emission discipline). Scoring a corpus with a
    model trained on that same corpus reproduces kn_bigram_logppl
    row-for-row (asserted in tests) — backoff never fires.

    Plan: the model splits into three bounded lookup tables (bigram /
    w1 / w2) + a 1-row total; scoring is one bigram explode and three
    LEFT joins keyed on the bigram and its two words."""
    bg = _bigram_stream(docs, id_col, text_col).select(
        id_col,
        "bg",
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    bgt = model.filter(F.col("kind") == "bg").select(
        "bg", F.col("a").alias("lq_seen")
    )
    ctx = model.filter(F.col("kind") == "ctx").select(
        "w1", F.col("a").alias("c_ctx"), F.col("b").alias("n1_fwd")
    )
    cont = model.filter(F.col("kind") == "cont").select(
        "w2", F.col("a").alias("n1_bwd")
    )
    tot = model.filter(F.col("kind") == "tot").select(
        F.col("a").alias("n_types")
    )
    d = F.lit(float(discount))
    backoff = (d * F.col("n1_fwd") / F.col("c_ctx")) * (
        F.col("n1_bwd").cast("double") / F.col("n_types")
    )
    unk = F.lit(1.0) / (F.col("n_types") + F.lit(1)).cast("double")
    scored = (
        bg.join(bgt, "bg", "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.coalesce(
                "lq_seen",
                F.when(
                    F.col("c_ctx").isNotNull()
                    & F.col("n1_bwd").isNotNull(),
                    F.round(F.log(backoff) * F.lit(1e6)).cast("long"),
                ),
                F.round(F.log(unk) * F.lit(1e6)).cast("long"),
            ).alias("lq"),
            F.col("lq_seen").isNull().cast("int").alias("is_bo"),
            (
                F.col("lq_seen").isNull()
                & (F.col("c_ctx").isNull() | F.col("n1_bwd").isNull())
            ).cast("int").alias("is_oov"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            (F.sum("is_bo") - F.sum("is_oov")).cast("int").alias(
                "n_backoff"
            ),
            F.sum("is_oov").cast("int").alias("n_oov"),
            F.sum("lq").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_backoff",
            "n_oov",
            micro6(
                -(F.col("_s").cast("double") / F.lit(1e6))
                / F.col("n_bigrams")
            ).alias("logppl"),
        )
    )


def kn_trigram_model(
    docs: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """The FROZEN Kneser-Ney TRIGRAM model as one persistable
    long-format table — kn_bigram_model's order-3 twin (the better
    filter per the tokenizer_compare card gets the same
    train-once/serve-forever artifact). Rows by `kind`:

      kind='tg'    tg, a = ln p3(w3|w1w2) quantized to int64 microunits
                   (seen trigrams — the fully trained path)
      kind='ctx3'  w12, a = c(w1w2 ·), b = N1+(w1w2 ·)
      kind='mid'   w2 w3, a = c'(w2w3) = N1+(· w2w3)
      kind='ctx2'  w2, a = c'(w2 ·), b = N1+'(w2 ·)
      kind='low'   w3, a = c''(w3)
      kind='tot'   a = N1+(· · ·)

    Raw counts — not precomputed probabilities — are stored for the
    backoff kinds so kn3_score_with recomputes the middle-order term in
    one fixed IEEE expression (engine-identical floats). Bounded by the
    training corpus's trigram-type count: a model artifact, not a data
    table."""
    tg = _ngram_stream(docs, 3, None, text_col, out_col="tg")
    t3, ctx3, mid, ctx2, low, tot = _kn3_tables(tg)
    p3 = _kn3_p3(discount)
    nul = F.lit(None).cast("string")
    nulb = F.lit(None).cast("long")
    tg_rows = (
        t3.join(ctx3, "w12")
        .join(mid, ["w2", "w3"])
        .join(ctx2, "w2")
        .join(low, "w3")
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit("tg").alias("kind"),
            F.col("tg"),
            nul.alias("w12"),
            nul.alias("w2"),
            nul.alias("w3"),
            F.round(F.log(p3) * F.lit(1e6)).cast("long").alias("a"),
            nulb.alias("b"),
        )
    )
    ctx3_rows = ctx3.select(
        F.lit("ctx3").alias("kind"), nul.alias("tg"), "w12",
        nul.alias("w2"), nul.alias("w3"),
        F.col("c_ctx3").alias("a"), F.col("n1f3").alias("b"),
    )
    mid_rows = mid.select(
        F.lit("mid").alias("kind"), nul.alias("tg"), nul.alias("w12"),
        "w2", "w3", F.col("c2p").alias("a"), nulb.alias("b"),
    )
    ctx2_rows = ctx2.select(
        F.lit("ctx2").alias("kind"), nul.alias("tg"), nul.alias("w12"),
        "w2", nul.alias("w3"),
        F.col("c_ctx2").alias("a"), F.col("n1f2").alias("b"),
    )
    low_rows = low.select(
        F.lit("low").alias("kind"), nul.alias("tg"), nul.alias("w12"),
        nul.alias("w2"), "w3", F.col("c1p").alias("a"), nulb.alias("b"),
    )
    tot_rows = tot.select(
        F.lit("tot").alias("kind"), nul.alias("tg"), nul.alias("w12"),
        nul.alias("w2"), nul.alias("w3"),
        F.col("n_types").alias("a"), nulb.alias("b"),
    )
    return (
        tg_rows.unionByName(ctx3_rows)
        .unionByName(mid_rows)
        .unionByName(ctx2_rows)
        .unionByName(low_rows)
        .unionByName(tot_rows)
    )


def kn3_score_with(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(doc_id, n_trigrams, n_backoff, n_oov, logppl) — score documents
    under a FROZEN kn_trigram_model: kn_score_with's order-3 twin, the
    same three-branch serving contract:

      seen trigram            -> the model's quantized ln p3   (exact)
      seen ctx (w1w2) AND
      seen cont. bigram (w2w3)-> interpolation weight x middle order:
                                 ln( D·N1+(w1w2·)/c(w1w2·) · p2(w3|w2) )
                                 (p2 recomputed from the stored raw
                                 counts in the SAME fixed IEEE
                                 expression as training)   (n_backoff)
      anything else unseen    -> uniform unk floor
                                 ln(1/(N1+(···)+1))            (n_oov)

    (mid present implies ctx2/low present — they are rollups of mid —
    so the backoff branch never reads a NULL.) Every branch quantizes
    at its single ln() call; per-doc means are exact integer sums.
    Scoring the training corpus reproduces kn_trigram_logppl
    row-for-row (asserted in tests) — backoff never fires.

    Plan: the model splits into five bounded lookup tables + a 1-row
    broadcast total; scoring is one trigram explode and four LEFT
    joins keyed on the trigram and its context/continuation parts.
    Docs with < 3 tokens are absent (no evidence, no score)."""
    tg = _ngram_stream(docs, 3, id_col, text_col, out_col="tg").select(
        id_col,
        "tg",
        F.substring_index("tg", " ", 2).alias("w12"),
        F.substring_index(
            F.substring_index("tg", " ", 2), " ", -1
        ).alias("w2"),
        F.substring_index("tg", " ", -1).alias("w3"),
    )
    tgt = model.filter(F.col("kind") == "tg").select(
        "tg", F.col("a").alias("lq_seen")
    )
    ctx3 = model.filter(F.col("kind") == "ctx3").select(
        "w12", F.col("a").alias("c_ctx3"), F.col("b").alias("n1f3")
    )
    mid = model.filter(F.col("kind") == "mid").select(
        "w2", "w3", F.col("a").alias("c2p")
    )
    ctx2 = model.filter(F.col("kind") == "ctx2").select(
        "w2", F.col("a").alias("c_ctx2"), F.col("b").alias("n1f2")
    )
    low = model.filter(F.col("kind") == "low").select(
        "w3", F.col("a").alias("c1p")
    )
    tot = model.filter(F.col("kind") == "tot").select(
        F.col("a").alias("n_types")
    )
    d = F.lit(float(discount))
    backoff = (d * F.col("n1f3") / F.col("c_ctx3")) * _kn3_p2(discount)
    unk = F.lit(1.0) / (F.col("n_types") + F.lit(1)).cast("double")
    scored = (
        tg.join(tgt, "tg", "left")
        .join(ctx3, "w12", "left")
        .join(mid, ["w2", "w3"], "left")
        .join(ctx2, "w2", "left")
        .join(low, "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.coalesce(
                "lq_seen",
                F.when(
                    F.col("c_ctx3").isNotNull()
                    & F.col("c2p").isNotNull(),
                    F.round(F.log(backoff) * F.lit(1e6)).cast("long"),
                ),
                F.round(F.log(unk) * F.lit(1e6)).cast("long"),
            ).alias("lq"),
            F.col("lq_seen").isNull().cast("int").alias("is_bo"),
            (
                F.col("lq_seen").isNull()
                & (F.col("c_ctx3").isNull() | F.col("c2p").isNull())
            ).cast("int").alias("is_oov"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_trigrams"),
            (F.sum("is_bo") - F.sum("is_oov")).cast("int").alias(
                "n_backoff"
            ),
            F.sum("is_oov").cast("int").alias("n_oov"),
            F.sum("lq").alias("_s"),
        )
        .select(
            id_col,
            "n_trigrams",
            "n_backoff",
            "n_oov",
            micro6(
                -(F.col("_s").cast("double") / F.lit(1e6))
                / F.col("n_trigrams")
            ).alias("logppl"),
        )
    )


def read_ppl_store(
    spark, store_path: str, id_type: str = "long", order: int = 2
) -> DataFrame:
    """The maintained (doc_id, n_bigrams|n_trigrams, n_backoff, n_oov,
    logppl) scores table under a frozen LM (count column named by the
    model order); empty-typed frame if the store does not exist yet
    (the read_postings missing-vs-corrupt discipline)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
        _parse_datatype_string,
    )

    return spark.createDataFrame(
        [],
        StructType([
            StructField("doc_id", _parse_datatype_string(id_type)),
            StructField(_ppl_count_col(order), IntegerType()),
            StructField("n_backoff", IntegerType()),
            StructField("n_oov", IntegerType()),
            StructField("logppl", DoubleType()),
        ]),
    )


def _ppl_count_col(order: int) -> str:
    """Count column name for a frozen-LM score row: the serving scorers
    name it by n-gram order (kn_score_with -> n_bigrams,
    kn3_score_with -> n_trigrams)."""
    if order == 2:
        return "n_bigrams"
    if order == 3:
        return "n_trigrams"
    raise ValueError(f"unsupported LM order {order} (2 or 3)")


def update_ppl_store(
    spark,
    store_path: str,
    model: DataFrame,
    changed_docs: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_type: str = "long",
    discount: float = 0.75,
    fresh_scores: DataFrame | None = None,
    order: int = 2,
) -> None:
    """Incremental perplexity-score maintenance under a FROZEN
    kn_bigram_model (order=2) or kn_trigram_model (order=3) — the
    LM-filter analog of bpe.update_token_store (the eighth maintained
    sink). INVARIANT (asserted in tests): after any update sequence the
    store equals kn_score_with()/kn3_score_with() over the current
    corpus with the same model — incremental == rebuild, so quality
    gates reading the store see exactly the batch scores. Per-batch
    cost is delta-sized: only the changed docs' n-grams are scored; the
    model is never retrained."""
    from ..store_util import overwrite_store, union_keys

    if fresh_scores is not None and changed_docs is None:
        # fresh_scores rides WITH changed_docs, never instead of it:
        # changed_docs supplies the gone-set (stale rows to remove,
        # including short docs absent from the scores). Silently
        # ignoring orphan scores would skip the store write and break
        # the incremental == rebuild invariant without any error.
        raise ValueError(
            "update_ppl_store: fresh_scores requires changed_docs "
            "(it supplies the gone-set; scores alone cannot be applied)"
        )
    fresh = None
    if changed_docs is not None:
        # fresh_scores: a caller that already scored THIS delta under
        # THE SAME model (e.g. the ingest ppl gate) passes the rows
        # through — (id, n_bigrams, n_backoff, n_oov, logppl), short
        # unscoreable docs already absent. changed_docs still supplies
        # the gone set, so short docs' stale rows are removed either way
        scorer = kn_score_with if order == 2 else kn3_score_with
        fresh = (
            fresh_scores
            if fresh_scores is not None
            else scorer(changed_docs, model, id_col, text_col, discount)
        ).select(
            F.col(id_col).cast(id_type).alias("doc_id"),
            _ppl_count_col(order),
            "n_backoff",
            "n_oov",
            "logppl",
        )
    overwrite_store(
        store_path,
        read_ppl_store(spark, store_path, id_type, order),
        "doc_id",
        gone=union_keys(
            "doc_id",
            (
                changed_docs.select(F.col(id_col).cast(id_type).alias("doc_id"))
                if changed_docs is not None
                else None
            ),
            (
                deleted_ids.select(F.col("doc_id").cast(id_type))
                if deleted_ids is not None
                else None
            ),
        ),
        fresh=fresh,
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, pair_count, pmi) — the top-k adjacent-word collocations
    by pointwise mutual information: PMI(w1,w2) = ln( p(w1,w2) /
    (p(w1)·p(w2)) ) with p(w1,w2) = c12/N_bigrams and p(w) = c_w/N_tokens,
    restricted to pairs seen >= min_count times (the standard guard
    against PMI's low-frequency blow-up). The collocation-mining step of
    a phrase-vocabulary / tokenizer-prep pipeline (reference context:
    memory/types.rs keyword extraction is unigram TF-IDF; this is the
    bigram phrase layer next to it).

    Scale shape: ONE bigram explode → map-side-combined pair counts; one
    token explode → unigram counts; both corpus totals are lazy 1-row
    broadcast aggregates (never a window over the unbounded bigram
    table); the two probability joins key on single words against the
    BOUNDED vocab table; TakeOrdered(k) ends it — no full sort. Ties at
    the rounded PMI break (w1, w2) ASC so the top-k set is deterministic
    across engines."""
    pair_expr = (
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1),"
        " i -> named_struct('w1', element_at(__toks, i),"
        " 'w2', element_at(__toks, i + 1))) "
        "ELSE array() END"
    )
    pairs = (
        fan_out(docs)
        .withColumn("__toks", _ws_tokens(F.col(text_col)))
        .select(F.explode(F.expr(pair_expr)).alias("z"))
        .select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uc = (
        fan_out(docs)
        .select(F.explode(_ws_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_bg = pc.agg(F.sum("pair_count").cast("double").alias("n_bg"))
    n_tok = uc.agg(F.sum("c").cast("double").alias("n_tok"))
    scored = (
        pc.filter(F.col("pair_count") >= min_count)
        .join(uc.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_bg))
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_bg"))
                    / (
                        (F.col("c1") / F.col("n_tok"))
                        * (F.col("c2") / F.col("n_tok"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(k)


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 20,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, oov_tokens, oov_rate) — tokenizer-coverage
    analysis: build the top-`vocab_size` corpus vocabulary by token
    count (ties token ASC, so the vocab set is deterministic), then
    measure each group's out-of-vocabulary token-OCCURRENCE rate. The
    pre-flight check of tokenizer/vocabulary prep: a source whose OOV
    rate is high is mis-served by the planned vocab (and will fragment
    into many subword units downstream).

    Scale shape: one token explode feeding a map-side-combined count;
    the vocab is a TakeOrdered(vocab_size) — a BOUNDED broadcast list —
    so membership is a broadcast left join against the token stream
    (never a shuffle keyed on the unbounded token column); the per-group
    rollup is map-side combinable. At 100 TB the only exchanges are the
    word-count combine and the tiny per-group aggregate."""
    tok = fan_out(docs).select(
        F.col(group_col).alias("source"),
        F.explode(_ws_tokens(F.col(text_col))).alias("w"),
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).cast("long").alias("oov_tokens"),
            F.round(
                F.sum(oov).cast("double") / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, distinct_chars, entropy_bits) — per-document
    Shannon entropy of the character distribution, H = -Σ p(c)·log2
    p(c), computed via the one-pass identity H = log2(N) - (Σ n·log2
    n)/N so no per-doc total ever needs a window or join. The cheap
    garbage detector of a curation stack: natural text sits ~4-4.5
    bits/char, base64/hex blobs higher with a flat distribution,
    single-char runs near 0 — outliers on BOTH ends are suspect. Empty
    docs are absent (no distribution to measure).

    Scale shape: one char explode → map-side-combined (doc, char)
    counts → one per-doc rollup; both aggregations combine map-side and
    nothing joins — an embarrassingly parallel two-level aggregation."""
    ch = fan_out(docs).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("c")
    )
    # both engines split '' into [''] — drop the empty token so empty
    # docs are genuinely absent rather than a zero-entropy phantom row
    per = (
        ch.filter(F.length("c") > 0)
        .groupBy(id_col, "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_tot = F.sum("n")
    # entropy_bits is emitted in exact integer microunits (functions/
    # emit.py): log2 is libm-dependent, and a driver whose DuckDB build
    # differs by an ulp can flip round(x, 6) across a boundary even when
    # every displayed decimal agrees (r8 driver hash-red, bit-exact in
    # repo). The final orderBy is belt-and-braces determinism for any
    # order-sensitive hash.
    return (
        per.groupBy(id_col)
        .agg(
            n_tot.alias("n_chars"),
            F.count(F.lit(1)).cast("int").alias("distinct_chars"),
            micro6(
                F.log2(n_tot) - F.sum(F.col("n") * F.log2("n")) / n_tot
            ).alias("entropy_bits"),
        )
        .orderBy(id_col)
    )


def fuzzy_term_pairs(
    docs: DataFrame,
    min_count: int = 2,
    max_dist: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(term_a, term_b, dist, count_a, count_b) — every vocabulary pair
    within edit distance 1..max_dist (the typo/variant-mining step of
    corpus normalization), restricted to terms seen >= min_count times
    and canonicalized term_a < term_b. Found by FastSS deletion-
    neighborhood blocking (Bocek et al. 2007): ed(a, b) <= k iff a and
    b share a key among their up-to-k-deletion variants, so ONE
    equi-join on the deletion key finds every candidate and a built-in
    levenshtein() verifies the exact distance. The blocking is LOSSLESS
    by the deletion-neighborhood theorem, and the oracle PROVES it: the
    DuckDB twin is the brute-force O(V²) levenshtein join over the same
    vocabulary, so a hash match certifies no pair was missed.

    Scale shape: the candidate join keys on the deletion variant —
    O(len²) keys per term for k=2, word-count shapes throughout, never
    a cross-join of the vocabulary (the brute force that stops scaling
    at ~10^5 terms exists only on the oracle side, where the vocab is
    test-sized); levenshtein runs only on blocked candidates."""
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_term_pairs supports max_dist 1 or 2")
    uc = (
        fan_out(docs)
        .select(F.explode(_ws_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    d1 = (
        "transform(sequence(1, length(w)),"
        " i -> concat(substring(w, 1, i - 1), substring(w, i + 1, length(w))))"
    )
    if max_dist == 1:
        del_expr = f"array_distinct(concat(array(w), {d1}))"
    else:
        d2 = (
            f"flatten(transform({d1}, v -> if(length(v) >= 1,"
            " transform(sequence(1, length(v)),"
            " j -> concat(substring(v, 1, j - 1), substring(v, j + 1, length(v)))),"
            " array())))"
        )
        del_expr = f"array_distinct(concat(array(w), {d1}, {d2}))"
    keyed = uc.select(
        "w", "c", F.explode(F.expr(del_expr)).alias("k")
    )
    a = keyed.select(
        F.col("k"), F.col("w").alias("term_a"), F.col("c").alias("count_a")
    )
    b = keyed.select(
        F.col("k"), F.col("w").alias("term_b"), F.col("c").alias("count_b")
    )
    cand = (
        a.join(b, "k")
        .filter(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b", "count_a", "count_b")
        .distinct()
    )
    return cand.select(
        "term_a",
        "term_b",
        F.levenshtein("term_a", "term_b").alias("dist"),
        "count_a",
        "count_b",
    ).filter(F.col("dist").between(1, max_dist))


def zipf_ttr_card(
    docs: DataFrame,
    top_k: int = 100,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, n_types, ttr, zipf_slope) — per-source lexical
    health card: type-token ratio and the fitted Zipf exponent, the two
    standard corpus-audit statistics next to the Gopher/heuristic gates
    (natural text fits ln(freq) ≈ a + s·ln(rank) with s ≈ −1; template
    or boilerplate-heavy sources flatten toward 0, token-soup sources
    steepen — Zipf 1949; Piantadosi 2014 review).

    zipf_slope = OLS slope of y=ln(freq) on x=ln(rank) over the
    source's top_k terms (freq DESC, word ASC tiebreak — deterministic
    ranks). Engine-exact: x and y quantize to int64 microunits at their
    single ln() call; Σx, Σy, Σxy, Σx² are exact integer sums (bounded:
    |x6·y6| ≲ 6.5e13 per term, k·that ≲ 6.5e15 « 2^63); the closed-form
    slope (k·Σxy − Σx·Σy)/(k·Σx² − (Σx)²) is one fixed IEEE expression
    over those integers, micro6 at the emission. Sources with fewer
    than 2 distinct terms emit NULL slope (the 0/0 guard both engines
    apply explicitly). ttr = micro6(n_types / n_tokens).

    Plan shape: ONE corpus tokenize/explode feeds a (source, word)
    count table (two-stage map-side-combinable agg); the rank window
    partitions by source over that VOCAB-sized table (never the token
    stream), the top_k filter bounds the regression input, and the
    totals are a second aggregate of the same count table — the corpus
    is touched once."""
    words = fan_out(docs).select(
        F.col(source_col).alias("source"),
        F.explode(_ws_tokens(F.col(text_col))).alias("w"),
    )
    cnt = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("freq")
    )
    totals = cnt.groupBy("source").agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    from pyspark.sql.window import Window

    rw = Window.partitionBy("source").orderBy(
        F.desc("freq"), F.asc("w")
    )
    top = (
        cnt.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= top_k)
        .select(
            "source",
            F.round(F.log(F.col("rank").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("x6"),
            F.round(F.log(F.col("freq").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("y6"),
        )
    )
    reg = top.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
    )
    denom = (
        F.col("k").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    slope = (
        F.col("k").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / denom
    return (
        totals.join(reg, "source")
        .select(
            "source",
            "n_tokens",
            "n_types",
            micro6(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("ttr"),
            F.when(denom > 0, micro6(slope)).alias("zipf_slope"),
        )
        .orderBy("source")
    )
