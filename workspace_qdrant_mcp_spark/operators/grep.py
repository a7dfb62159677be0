"""Line-level exact/regex grep over code_lines (the reference's grep tool).

Parity targets (SURVEY §2.4):
  T1 exact search — the reference does trigram MATCH prefilter + INSTR exact
     verify (text_search/exact_search/query_builder.rs:12-60). In Spark the
     parallel scan with a pushed `instr` predicate IS the fast path; the
     reference itself switches to a file scan above 5,000 candidates
     (grep_search/mod.rs:20-26), i.e. its scale path converges on ours.
  T2 regex search — literal-prefilter + regex verify → `rlike` (Catalyst
     keeps it in codegen); an optional `contains` prefilter mirrors the
     trigram-literal optimization for selective literals.
  T4 context lines — N lines before/after each match: a window over
     (doc, line_number), no self-join (always-emit contract,
     client/src/search/exact.rs:77-88).
  T6 scope filters + max_results (default 1000, definitions.rs:350-353).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_RESULTS = 1000


def grep_exact(
    lines: DataFrame,
    pattern: str,
    case_insensitive: bool = False,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring match over (doc_id, line_number, content)."""
    content = F.lower(F.col("content")) if case_insensitive else F.col("content")
    pat = pattern.lower() if case_insensitive else pattern
    return (
        lines.filter(F.instr(content, pat) > 0)
        .orderBy(F.asc(id_col), F.asc("line_number"))
        .limit(max_results)
    )


def grep_regex(
    lines: DataFrame,
    pattern: str,
    prefilter_literal: str | None = None,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex match; an optional literal `contains` prefilter short-circuits
    the regex the way the reference's trigram-literal extraction does
    (text_search/mod.rs:15-21) — cheap contains first, regex verify after."""
    df = lines
    if prefilter_literal:
        df = df.filter(F.instr(F.col("content"), prefilter_literal) > 0)
    return (
        df.filter(F.col("content").rlike(pattern))
        .orderBy(F.asc(id_col), F.asc("line_number"))
        .limit(max_results)
    )


_CLASS_CAP = 8        # max chars a [] class may enumerate to stay prunable
_EXPANSION_CAP = 16   # max concrete expansions per required segment


def _expand_class(body: str) -> list[str] | None:
    """Enumerate a [...] class body into its member chars; None when it
    cannot be safely enumerated (negation, big/descending ranges, or more
    than _CLASS_CAP members) — the caller then treats it as a BREAK."""
    if body.startswith("^") or not body:
        return None
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            esc = body[i + 1]
            if esc.isalnum():
                # class shorthand (\d \w \s \D \W \S, octal, ...) — NOT a
                # literal; enumerating it as one would emit a WRONG
                # required-gram and prune real matches (lossless contract)
                return None
            out.append(esc)
            i += 2
            continue
        if i + 2 < len(body) and body[i + 1] == "-":
            lo, hi = ord(c), ord(body[i + 2])
            if hi < lo or hi - lo + 1 > _CLASS_CAP:
                return None
            out.extend(chr(x) for x in range(lo, hi + 1))
            i += 3
            continue
        out.append(c)
        i += 1
    if not out or len(out) > _CLASS_CAP:
        return None
    return out


def regex_gram_groups(
    pattern: str, n: int = 3
) -> list[list[list[str]]] | None:
    """Extract the REQUIRED-gram condition of a regex for trigram-index
    pruning — the Google-Code-Search design (Cox 2012, "Regular
    Expression Matching with a Trigram Index"): a necessary (never
    sufficient) condition built only from parts of the pattern every
    match must contain, verified afterwards by the full regex.

    Returns AND-of-OR-of-AND structure: a list of SEGMENTS (every match
    satisfies ALL), each a list of concrete EXPANSIONS (a match realizes
    at least ONE), each the expansion's lowercased n-gram list. None =
    no prunable segment (the caller takes the scan arm).

    CONSERVATIVE BY CONSTRUCTION (losslessness is the whole game):
      - any unescaped '(' , ')' or '|' → None. Groups/alternation can
        make atoms optional in ways a linear scan misreads (e.g.
        '(abc)?x' requires nothing of 'abc').
      - a quantifier ('*', '+', '?', '{..}') DROPS the atom it
        quantifies (replaced by a break): '+'-atoms are required but
        repetition breaks gram adjacency, so dropping stays safe.
      - '.', anchors, unknown escapes (\\d, \\w, ...) → break.
      - a [] class enumerable to <= 8 chars contributes its member set;
        anything else → break.
    What survives is a run of fixed one-char atom sets; every match
    contains a concrete realization of each run, so the run's grams (of
    one expansion, lowercased — the index folds case) are all present
    in the matching document's gram set."""
    _META = set(".^$*+?()[]{}|\\/-")
    atoms: list[set[str] | None] = []
    i, ln = 0, len(pattern)
    while i < ln:
        c = pattern[i]
        if c in "()|":
            return None
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < ln else ""
            if nxt in ("(", ")", "|"):
                atoms.append({nxt})
            elif nxt in _META:
                atoms.append({nxt})
            else:
                atoms.append(None)
            i += 2
            continue
        if c == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                atoms.append(None)
                i += 1
                continue
            members = _expand_class(pattern[i + 1 : j])
            atoms.append(set(members) if members else None)
            i = j + 1
            continue
        if c in "*+?":
            if atoms:
                atoms[-1] = None
            i += 1
            continue
        if c == "{":
            j = pattern.find("}", i)
            if atoms:
                atoms[-1] = None
            i = (j + 1) if j != -1 else ln
            continue
        if c in ".^$":
            atoms.append(None)
            i += 1
            continue
        atoms.append({c})
        i += 1

    # split on breaks into runs of fixed char-set atoms
    runs: list[list[set[str]]] = []
    cur: list[set[str]] = []
    for a in atoms + [None]:
        if a is None:
            if cur:
                runs.append(cur)
            cur = []
        else:
            cur.append(a)

    groups: list[list[list[str]]] = []
    queue: list[list[set[str]]] = list(runs)  # explicit work queue — never
    # mutate a list mid-iteration (over-cap runs re-enqueue sub-runs)
    while queue:
        run = queue.pop(0)
        if len(run) < n:
            continue
        prod = 1
        for a in run:
            prod *= len(a)
        if prod > _EXPANSION_CAP:
            # too many expansions: keep only the pure-literal sub-runs
            sub: list[set[str]] = []
            for a in run + [set("xy")]:  # len>1 sentinel flushes
                if len(a) == 1:
                    sub.append(a)
                else:
                    if len(sub) >= n:
                        queue.append(sub)  # re-enqueue as its own run
                    sub = []
            continue
        expansions = [""]
        for a in run:
            expansions = [e + c for e in expansions for c in sorted(a)]
        gram_lists = []
        for e in expansions:
            f = e.lower()
            gram_lists.append(
                sorted({f[k : k + n] for k in range(len(f) - n + 1)})
            )
        groups.append(gram_lists)
    return groups or None


def grep_regex_indexed(
    lines: DataFrame,
    gram_index: DataFrame,
    pattern: str,
    n: int = 3,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
    id_pushdown: int = 0,
) -> DataFrame:
    """T2 joins the cost-based engine switch: regex grep served off the
    maintained trigram index when regex_gram_groups can extract a
    required-gram condition, the full parallel scan otherwise — the
    reference's trigram-literal prefilter (text_search/mod.rs:15-21)
    upgraded to the code-search AND-of-OR-of-AND form (Cox 2012).

    Candidates: per required segment, ONE pass over the index restricted
    to the segment's gram universe, then a per-doc collect_set and an
    exists/forall check over the (<= 16) expansions' gram lists;
    segments intersect by inner join. LOSSLESS because the condition is
    necessary (regex_gram_groups' conservativeness) and the verify runs
    the full rlike on the pruned lines — the driver oracle IS the full
    regex scan, so a hash match certifies no match was pruned. With
    id_pushdown > 0, a small candidate set is collected (bounded) and
    pushed into the verify scan as an IN literal — the fetch-by-rowid
    shape, same as grep_exact_indexed's third arm."""
    groups = regex_gram_groups(pattern, n)
    if not groups:
        return grep_regex(lines, pattern, max_results=max_results, id_col=id_col)
    cand = None
    for seg in groups:
        universe = sorted({g for exp in seg for g in exp})
        exp_lit = F.array(
            *[F.array(*[F.lit(g) for g in exp]) for exp in seg]
        )
        doc_grams = (
            gram_index.filter(F.col("gram").isin(universe))
            .groupBy(id_col)
            .agg(F.collect_set("gram").alias("__gs"))
        )
        seg_cand = doc_grams.filter(
            F.exists(
                exp_lit,
                lambda e: F.forall(
                    e, lambda g: F.array_contains(F.col("__gs"), g)
                ),
            )
        ).select(id_col)
        cand = seg_cand if cand is None else cand.join(seg_cand, id_col)
    if id_pushdown > 0:
        ids = [r[0] for r in cand.limit(id_pushdown + 1).collect()]
        if len(ids) <= id_pushdown:
            pruned = (
                lines.filter(F.col(id_col).isin(ids))
                if ids
                else lines.filter(F.lit(False))
            )
            return grep_regex(
                pruned, pattern, max_results=max_results, id_col=id_col
            )
    pruned = lines.join(cand, id_col, "left_semi")
    return grep_regex(pruned, pattern, max_results=max_results, id_col=id_col)


def with_context(
    lines: DataFrame,
    matches: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach context_before / context_after (joined with newline) to each
    match. Context is computed over the FULL line table with a window, then
    inner-joined to the matches — no per-match self-join storm. Context
    fields are always present (empty string at file edges), matching the
    always-emit contract (exact.rs:77-88)."""
    w = Window.partitionBy(id_col).orderBy("line_number")
    ctx = lines.select(
        id_col,
        "line_number",
        F.array_join(
            F.collect_list("content").over(w.rowsBetween(-n, -1)), "\n"
        ).alias("context_before"),
        F.array_join(
            F.collect_list("content").over(w.rowsBetween(1, n)), "\n"
        ).alias("context_after"),
    )
    return matches.join(ctx, [id_col, "line_number"])


def build_gram_index(
    lines: DataFrame, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, gram) — distinct char n-grams per document over line
    content: the candidate index of the reference's exact_search trigram
    MATCH prefilter (text_search/exact_search/query_builder.rs:12-60,
    FTS5 trigram tokenizer). Grams are LOWERCASED (char_shingles folds
    case, matching FTS5's case-folding tokenizer) — so candidate
    generation must fold the PATTERN's grams too (grep_exact_indexed
    does), making candidates a case-insensitive SUPERSET of the
    case-sensitive matches; the instr verify stage restores exactness.
    A prefilter may be coarser than its verifier, never finer. One
    explode + distinct; maintained incrementally at ingest via
    update_gram_index."""
    from ..functions.text import char_shingles

    return (
        lines.select(
            F.col(id_col),
            F.explode(char_shingles(F.col("content"), n)).alias("gram"),
        )
        .distinct()
    )


def read_gram_index(
    spark, store_path: str, id_col: str = "doc_id", id_type: str = "long"
) -> DataFrame:
    """The maintained (doc_id, gram) table; empty-typed frame only when
    MISSING — an unreadable store aborts loudly (the read_postings
    discipline)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    return spark.createDataFrame([], f"{id_col} {id_type}, gram string")


def update_gram_index(
    spark,
    store_path: str,
    changed_lines: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    n: int = 3,
    id_col: str = "doc_id",
    id_type: str = "long",
) -> None:
    """Incremental maintenance of the grep candidate index: drop the
    grams of changed/deleted documents (one anti-join on the doc key),
    append the recomputed grams of the changed documents only —
    the postings-store skeleton applied to T1/T3's trigram index.
    INVARIANT (asserted in tests): after any update sequence the store
    equals build_gram_index over the current corpus."""
    from ..store_util import overwrite_store, union_keys

    overwrite_store(
        store_path,
        read_gram_index(spark, store_path, id_col, id_type),
        id_col,
        gone=union_keys(id_col, changed_lines, deleted_ids),
        fresh=(
            build_gram_index(changed_lines, n, id_col)
            if changed_lines is not None
            else None
        ),
    )


def grep_exact_indexed(
    lines: DataFrame,
    gram_index: DataFrame,
    pattern: str,
    n: int = 3,
    case_insensitive: bool = False,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
    id_pushdown: int = 0,
) -> DataFrame:
    """T3 — the COST-BASED ENGINE SWITCH, previously scoped n/a: exact
    grep served off the maintained gram index when the query qualifies,
    full parallel scan otherwise (the reference's own architecture:
    trigram MATCH candidates + INSTR verify, falling back to the file
    scan engine when the index can't help, grep_search/mod.rs:2-26).

    Qualifies = case-sensitive literal of length >= n. Candidates = docs
    whose gram set contains ALL of the pattern's distinct LOWERCASED
    n-grams (the index is lowercase — char_shingles folds case, so raw
    mixed-case pattern grams could never match and would silently prune
    every hit; r8 ADVICE). Folding makes the candidate set a
    case-insensitive SUPERSET, and LOSSLESS by construction: a line
    containing the literal contributes every one of its lowercased
    n-grams to its document's gram set, so no matching document can be
    pruned (the fuzzy_term_pairs discipline: the driver oracle IS the
    full-scan query, so the hash match certifies losslessness); the
    unchanged case-sensitive instr verify restores exactness.
    Non-qualifying queries (short literal, case-folded search) take the
    scan path unchanged.

    Scale shape: the pattern's grams are a tiny broadcast list; the
    candidate aggregate runs over the index (docs × distinct-grams, far
    smaller than the line table), and the verify scan reads only
    candidate documents via one semi-join — the corpus-wide line scan
    happens exactly never for selective literals."""
    if case_insensitive or len(pattern) < n:
        # the switch's scan arm — the index cannot serve this query
        return grep_exact(
            lines, pattern, case_insensitive, max_results, id_col
        )
    folded = pattern.lower()
    grams = sorted({folded[i : i + n] for i in range(len(folded) - n + 1)})
    # isin, not a broadcast join: an IN literal reaches the parquet scan
    # as a pushed filter (row-group/dictionary pruning on the gram
    # column), so the cold-store read touches only matching pages; on
    # the pinned in-memory snapshot it is a plain predicate with no
    # join/exchange at all
    cand = (
        gram_index.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("__k"))
        .filter(F.col("__k") == len(grams))
        .select(id_col)
    )
    if id_pushdown > 0:
        # point-lookup arm (the reference fetches candidate rows by
        # rowid, grep_search/mod.rs): collect the candidate doc ids —
        # BOUNDED by id_pushdown — and push them into the line scan as
        # an IN literal, which reaches a parquet source as a pushed
        # filter (row-group min/max pruning on a sorted id column). A
        # broad pattern whose candidates exceed the cap falls through to
        # the distributed semi-join — the cost-based switch's third arm:
        # scan / semi-join / id-pushdown by selectivity.
        ids = [r[0] for r in cand.limit(id_pushdown + 1).collect()]
        if len(ids) <= id_pushdown:
            pruned = (
                lines.filter(F.col(id_col).isin(ids))
                if ids
                else lines.filter(F.lit(False))
            )
            return grep_exact(pruned, pattern, False, max_results, id_col)
    pruned = lines.join(cand, id_col, "left_semi")
    return grep_exact(pruned, pattern, False, max_results, id_col)
