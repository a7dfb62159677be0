"""Deterministic sketch operators.

HyperLogLog (Flajolet et al. 2007) built from first principles on md5
hashes so the DuckDB oracle reproduces the REGISTERS bit-for-bit — the
"novel sketch as a custom operator" case: Spark's own
approx_count_distinct and DuckDB's approx functions use different
hash families, so their estimates can never cross-validate; this one's
can. The register build is the real distributed story — a single
groupBy(bucket) max aggregate, mergeable across any partitioning, which
is WHY sketches work at 100 TB: registers from per-partition partial
aggregation merge by max, and the final estimate reads 2^p tiny rows.

Determinism notes pinned for the oracle:
  - hash domain: md5_hash64 is a 60-BIT positive value (15 hex chars),
    so the rank word after the p bucket bits is 60 - p bits wide — the
    width must match the hash domain or every rank is shifted by a
    constant and the estimate is off by that power of two;
  - bucket = low p bits; rank ρ = leading zeros of the remaining word
    + 1, computed EXACTLY via the binary-string length (no float log2
    anywhere);
  - the 2^-M_j sum is a cumulative windowed sum ORDERED BY bucket —
    both engines add the same 2^p doubles in the same order, so the
    float result is bit-identical (a plain aggregate sum would be
    partition-order-dependent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64

HLL_P = 8  # 2^8 = 256 registers
HASH_BITS = 60  # md5_hash64 = 15 hex chars


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, bucket, register) — the 2^p HyperLogLog registers
    of key_col's distinct values, one register set per group (or one
    global set when group_cols is empty). Buckets with no hash land are
    ABSENT (the caller treats them as register 0). THE one definition
    of the bucket/w/rho register derivation — the grouped estimate and
    the streaming state both build on it."""
    m = 1 << p
    word_bits = HASH_BITS - p
    v = md5_hash64(F.col(key_col).cast("string"))
    h = df.select(*group_cols, v.alias("v")).select(
        *group_cols,
        (F.col("v") % m).alias("bucket"),
        F.expr(f"v div {m}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(word_bits + 1)).otherwise(
        F.lit(word_bits + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        h.withColumn("rho", rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def _hll_corrected(m: int) -> Column:
    """The HLL estimate with the standard small-range correction, as a
    column over (s_present, n_present): raw = alpha*m^2 / (s_present +
    zeros·2^0); linear counting when raw <= 2.5m and zeros > 0. Shared
    by the global and grouped estimators so a correction-threshold fix
    lands in both (and their oracles) at once."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s_total
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)


def hll_estimate(
    df: DataFrame, key_col: str, p: int = HLL_P
) -> DataFrame:
    """(m, n_nonzero, hll_estimate, exact_distinct) — one row: the HLL
    cardinality estimate of key_col with the standard small-range
    correction (E <= 2.5m and empty registers -> linear counting), next
    to the exact distinct count for accuracy inspection. The estimate
    sum runs as an ordered cumulative window over the bounded register
    table so the oracle's float arithmetic is bit-identical."""
    from pyspark.sql.window import Window

    m = 1 << p
    regs = hll_registers(df, key_col, p)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    summed = (
        regs.withColumn("term", F.pow(F.lit(2.0), -F.col("register")))
        .withColumn("s_run", F.sum("term").over(w))
        .agg(
            F.max("s_run").alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
    )
    exact = df.agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    # absent buckets contribute 2^-0 = 1 each (inside _hll_corrected)
    return summed.crossJoin(exact).select(
        F.lit(m).alias("m"),
        F.col("n_present").cast("int").alias("n_nonzero"),
        F.round(_hll_corrected(m), 6).alias("hll_estimate"),
        "exact_distinct",
    )


def hll_error_bound(p: int = HLL_P) -> float:
    """The theoretical relative standard error 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


CMS_D = 4
CMS_W = 256


def cms_counters(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(row_idx, bucket, cnt) — the d×w Count-Min counter matrix
    (Cormode & Muthukrishnan 2005) of key_col occurrences, one
    md5-salted hash row per j. Mergeable by ADDITION (partial matrices
    sum), the CMS twin of HLL's max-merge — one groupBy on (j, bucket),
    counters bounded at d·w regardless of stream size."""
    rows = None
    for j in range(d):
        hj = (
            md5_hash64(F.col(key_col).cast("string"), salt=f"cms{j}|") % w
        ).alias("bucket")
        part = df.select(F.lit(j).alias("row_idx"), hj)
        rows = part if rows is None else rows.unionByName(part)
    return rows.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_point_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(key, cms_estimate, exact_count) — point-query frequency estimates
    for the probe keys: min over the d counters each key hashes into,
    next to the exact count. CMS guarantees estimate >= exact (asserted
    in tests) with overshoot bounded by collisions."""
    counters = cms_counters(df, key_col, d, w)
    probe_rows = None
    for j in range(d):
        hj = (
            md5_hash64(F.col("key").cast("string"), salt=f"cms{j}|") % w
        ).alias("bucket")
        part = probes.select("key", F.lit(j).alias("row_idx"), hj)
        probe_rows = (
            part if probe_rows is None else probe_rows.unionByName(part)
        )
    est = (
        probe_rows.join(counters, ["row_idx", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(exact, "key", "left").select(
        "key",
        "cms_estimate",
        F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
    )


KMV_K = 64


def kmv_sketch(
    df: DataFrame, key_col: str, k: int = KMV_K
) -> DataFrame:
    """(rank, key, h) — the k-minimum-values sketch (Bar-Yossef et al.
    2002): the k smallest md5 hashes of key_col's DISTINCT values. Dual
    use: (a) a deterministic uniform sample WITHOUT replacement of the
    distinct keys (hash order is a random permutation, but the same one
    on every engine/run), and (b) a distinct-count estimator from the
    k-th smallest hash. Mergeable by min-k union — the third merge
    discipline next to HLL's max and CMS's add. Plan: distinct → narrow
    hash map → TakeOrdered(k): no full sort, one reduction."""
    from pyspark.sql.window import Window

    ranked = (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", md5_hash64(F.col("key").cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy("h")))
    )
    return ranked.select("rank", "key", "h")


def kmv_distinct_estimate(
    df: DataFrame, key_col: str, k: int = KMV_K
) -> DataFrame:
    """(k, kth_hash, kmv_estimate, exact_distinct) — the KMV estimator
    n̂ = (k - 1) / (h_(k) / 2^60): if the k-th smallest of n uniform
    hashes sits at fraction f of the hash space, n ≈ (k-1)/f. Exact
    integer k-th hash; the one float division is identical on both
    engines."""
    sk = kmv_sketch(df, key_col, k)
    kth = sk.filter(F.col("rank") == k).select(
        F.col("h").alias("kth_hash")
    )
    exact = df.agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    return kth.crossJoin(exact).select(
        F.lit(k).alias("k"),
        "kth_hash",
        F.round(
            F.lit(float(k - 1))
            / (F.col("kth_hash").cast("double") / F.lit(float(1 << 60))),
            6,
        ).alias("kmv_estimate"),
        "exact_distinct",
    )


def bottomk_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 8,
) -> DataFrame:
    """(group, rnk, value) — a CONSISTENT uniform sample of k distinct
    value_col values PER GROUP: the k smallest salted md5 hashes (ties
    value ASC). The grouped-sampling twin of kmv_sketch's global
    bottom-k: hash order is a fixed random permutation of the value
    space, so the sample is (a) uniform over distinct values, (b)
    deterministic across engines/runs/partitionings, and (c) MERGEABLE
    — bottom-k of a union is the bottom-k of the per-shard bottom-ks,
    which is what makes it maintainable incrementally (the streaming
    twin carries exactly this state across micro-batches).

    Plan: distinct on (group, value) → narrow hash map → one rank
    window per group over the already-distinct rows. At 100 TB the
    distinct is the only exchange and is map-side combinable; the
    window input per group is its distinct-value count, and a skewed
    group can pre-prune with a per-partition bottom-k before the
    exchange (the merge law above is exactly why that is lossless)."""
    from pyspark.sql.window import Window

    h = md5_hash64(F.col("value").cast("string"), salt="sample|")
    ranked = (
        df.select(
            F.col(group_col).alias("group"),
            F.col(value_col).cast("string").alias("value"),
        )
        .distinct()
        .select("group", "value", h.alias("h"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("group").orderBy(
                    F.asc("h"), F.asc("value")
                )
            ),
        )
        .filter(F.col("rnk") <= k)
    )
    return ranked.select("group", "rnk", "value")


BLOOM_M = 1024  # bits
BLOOM_K = 4  # hash functions


def bloom_bits(
    df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(bit,) — the SET bit positions of a Bloom filter (Bloom 1970)
    over key_col's values: k md5-salted hash functions into m bits.
    Stored sparse (set positions only); merge discipline is OR — the
    distinct union of set-bit tables — completing the square next to
    HLL's max, CMS's add and KMV's min-k. Build is one narrow map +
    distinct; the filter is bounded at m rows regardless of input."""
    rows = None
    for j in range(k):
        hj = (
            md5_hash64(F.col(key_col).cast("string"), salt=f"bloom{j}|") % m
        ).alias("bit")
        part = df.select(hj)
        rows = part if rows is None else rows.unionByName(part)
    return rows.distinct()


def bloom_membership(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """(key, maybe_present, present_exact, n_bits_set, fp_estimate) —
    probe the filter: a key is maybe_present iff ALL k of its bits are
    set (the no-false-negative guarantee: present_exact ⇒ maybe_present,
    asserted in tests). n_bits_set and the classic density-based
    false-positive estimate (bits_set/m)^k ride along; the power is
    expanded to explicit multiplications so both engines run the same
    IEEE operations."""
    bits = bloom_bits(df, key_col, m, k)
    probe_rows = None
    for j in range(k):
        hj = (
            md5_hash64(F.col("key").cast("string"), salt=f"bloom{j}|") % m
        ).alias("bit")
        part = probes.select("key", hj)
        probe_rows = (
            part if probe_rows is None else probe_rows.unionByName(part)
        )
    hits = (
        # distinct first: two hash functions may collide on the same bit
        # for one key, and the all-k test counts distinct bits
        probe_rows.distinct()
        .join(bits.withColumn("set", F.lit(1)), "bit", "left")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_probe_bits"),
            F.sum(F.coalesce("set", F.lit(0))).alias("n_set"),
        )
        .select(
            "key", (F.col("n_set") == F.col("n_probe_bits")).alias("maybe_present")
        )
    )
    exact = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .withColumn("present_exact", F.lit(True))
    )
    nbits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    dens = F.col("n_bits_set").cast("double") / F.lit(float(m))
    fp = dens
    for _ in range(k - 1):
        fp = fp * dens
    return (
        hits.join(exact, "key", "left")
        .crossJoin(F.broadcast(nbits))
        .select(
            "key",
            "maybe_present",
            F.coalesce("present_exact", F.lit(False)).alias("present_exact"),
            "n_bits_set",
            F.round(fp, 6).alias("fp_estimate"),
        )
    )


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m: int = 1 << 17,
    k: int = BLOOM_K,
    how: str = "inner",
) -> DataFrame:
    """`big ⋈ small` on `on`, with the big side pre-filtered through a
    Bloom filter of the small side's keys BEFORE the join exchange —
    the hand-rolled twin of Spark's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.*, which only injects when
    its own selectivity heuristics fire; this operator makes the
    pruning explicit, deterministic, and cross-engine-verifiable).

    LOSSLESS by the no-false-negative guarantee: every big row with a
    real match passes the filter, and false positives are removed by
    the join itself — so the oracle is the PLAIN join. Only join types
    whose result cannot contain a filtered-out big row are legal:
    inner and left_semi (a pruned row has no match, so it contributes
    nothing). left/outer would need the pruned rows back, defeating
    the point — they raise.

    Scale shape: the filter is built as a packed bitmask — sparse set
    bits → (word = bit div 64, OR of 1<<bit%64) → ONE row holding a
    word→mask map of ≤ m/64 entries (m=2^17 → ≤ 2 KiB·8) — broadcast
    via crossJoin, probed with k O(1) map lookups per big row inside
    whole-stage codegen. The big side shrinks before the shuffle, which
    is the entire economics: at 100 TB a 1% -selective dim turns a
    corpus-wide exchange into a 1%-ish one for 16 KiB of broadcast."""
    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"bloom_pruned_join: how={how!r} would need the pruned big "
            f"rows in the result; supported: inner/left_semi"
        )
    # the probe hashes each side's key via CAST(... AS STRING): values a
    # plain join would coerce-match (1 INT vs 1.0 DOUBLE) stringify
    # differently and become FALSE NEGATIVES — so mismatched key types
    # must raise, not silently lose rows
    bt = dict(big.dtypes)[on]
    st = dict(small.dtypes)[on]
    if bt != st:
        raise ValueError(
            f"bloom_pruned_join: key {on!r} types differ (big={bt}, "
            f"small={st}); the string-hashed probe would drop "
            f"coerce-matched rows — cast one side first"
        )
    bits = bloom_bits(small.select(on), on, m, k)
    packed = (
        bits.select(
            F.expr("bit div 64").alias("w"),
            # F.shiftleft only takes a literal shift; call_function
            # reaches the SQL shiftleft that accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("bit") % 64).cast("int")
            ).alias("msk"),
        )
        .groupBy("w")
        .agg(F.bit_or("msk").alias("word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "word"))
            ).alias("__bloom")
        )
    )
    pred = None
    for j in range(k):
        h = md5_hash64(F.col(on).cast("string"), salt=f"bloom{j}|") % m
        word = F.coalesce(
            F.element_at(
                F.col("__bloom"), F.floor(h / F.lit(64)).cast("long")
            ),
            F.lit(0).cast("long"),
        )
        hit = (
            word.bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (h % 64).cast("int")
                )
            )
            != 0
        )
        pred = hit if pred is None else (pred & hit)
    pruned = (
        big.crossJoin(F.broadcast(packed)).filter(pred).drop("__bloom")
    )
    return pruned.join(small, on, how)


def _mg_summaries(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """(key, est) per partition — Misra-Gries frequency summaries with at
    most `capacity` tracked keys per partition. Per Arrow batch the
    counting is pandas value_counts (columnar); the MG decrement loop
    runs over the ≤capacity tracked keys, never over rows."""
    import pandas as pd

    out_schema = f"key string, est long"

    def per_partition(pdfs):
        counters: dict[str, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf[key_col].astype(str).value_counts()
            for key, cnt in vc.items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < capacity:
                    counters[key] = int(cnt)
                else:
                    # batch-MG decrement: absorb cnt against the current
                    # minimum repeatedly (equivalent to cnt unit
                    # decrements, O(capacity log capacity) amortized)
                    rem = int(cnt)
                    while rem > 0 and len(counters) >= capacity:
                        m = min(counters.values())
                        dec = min(rem, m)
                        rem -= dec
                        counters = {
                            k: v - dec for k, v in counters.items() if v > dec
                        }
                    if rem > 0:
                        counters[key] = rem
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "est": list(counters.values())}
            )

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        per_partition, out_schema
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """(key, cnt) — the keys whose EXACT count exceeds n/k, counts exact,
    ordered (cnt desc, key asc). Two-phase at-scale shape:

      1. candidate generation: per-partition Misra-Gries summaries with
         capacity k (Misra & Gries 1982); merging per-partition MG
         summaries preserves the undercount bound ≤ n/(k+1) (Agarwal et
         al. 2012 mergeable-summaries), so every key with true count
         > n/k ≥ strictly more than the bound survives as a candidate —
         the candidate union is ≤ k·partitions rows, never corpus-sized;
      2. exact verify: one count pass semi-joined to the candidate set,
         filtered against the n/k threshold (n as a lazy 1-row
         broadcast).

    The sketch decides WHAT to count exactly — the corpus-wide groupBy
    that a naive top-k needs never materializes rare keys' groups.

    NULL keys are excluded end-to-end (candidates AND the n
    denominator): pandas' astype(str) would otherwise track them as the
    literal 'None', which the exact-verify semi-join can never match
    (SQL null != 'None'), silently missing a genuinely heavy null key
    while still inflating the threshold (ADVICE r7 #4)."""
    nonnull = df.filter(F.col(key_col).isNotNull())
    cand = (
        _mg_summaries(nonnull, key_col, capacity=k)
        .select(F.col("key").alias(key_col))
        .distinct()
    )
    nn = nonnull.agg(F.count(F.lit(1)).alias("__n"))
    return (
        nonnull.select(F.col(key_col).cast("string").alias(key_col))
        .join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(key_col, "cnt")
        .orderBy(F.desc("cnt"), F.asc(key_col))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    width: float = 5.0,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(group, q5, q9, q99, ...) — per-group quantile ESTIMATES from a
    fixed-width mergeable histogram, the bounded-memory twin of
    temporal.value_quantiles (exact sort-based percentiles).

    Why this shape at 100 TB: an exact per-group percentile must sort or
    multi-pass the group; the histogram is a (group, bucket) -> count
    aggregate — map-side combinable, mergeable across any partitioning
    (counts add), and the quantile read touches |buckets| rows per
    group, not |rows|. Unlike t-digest/KLL (randomized compactions that
    no second engine can replay), the fixed-width histogram is fully
    deterministic, so the DuckDB oracle reproduces the ESTIMATES
    bit-for-bit — same reason the HLL above uses its own register build
    instead of approx_count_distinct.

    Estimate: bucket = floor(v / width); the p-quantile lives in the
    first bucket whose cumulative count reaches ceil(p * n); linear
    interpolation inside that bucket gives
      est = bucket*width + width * (target - cum_before) / bucket_count
    which is within `width` of any exact quantile definition (the true
    p-th element is inside the same bucket) — the error bound the
    pytest asserts against the exact type-7 numbers."""
    from pyspark.sql.window import Window

    bkt = df.select(
        F.col(group_col),
        F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bucket"),
    )
    hist = bkt.groupBy(group_col, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = Window.partitionBy(group_col).orderBy("bucket")
    wall = Window.partitionBy(group_col)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wall))
    )
    aggs = []
    for p in probs:
        target = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))
        est = (
            F.col("bucket") * F.lit(width)
            + F.lit(width)
            * (target - (F.col("cum") - F.col("cnt")))
            / F.col("cnt")
        )
        # the COVERING bucket only — the first whose cumsum reaches the
        # target (cum >= target and the previous cumsum was still short);
        # est is not monotone across later qualifying buckets, so a bare
        # min over all of them would be wrong
        covering = (F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target)
        name = f"q{str(p).replace('0.', '')}"
        aggs.append(
            F.round(F.min(F.when(covering, est)), 6).alias(name)
        )
    return cum.groupBy(group_col).agg(*aggs)


def hll_estimate_by_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """(group, m, n_nonzero, hll_estimate, exact_distinct) — the grouped
    form of hll_estimate: one register set PER GROUP, from a single
    groupBy(group, bucket) max aggregate.

    This is the shape a 100 TB report actually runs ("distinct users per
    event type / per day / per tenant"): |groups| * 2^p register rows
    total, map-side combinable, mergeable across shards by max — where a
    per-group exact count_distinct must shuffle every (group, key) pair.
    Same determinism contract as the global sketch (md5 registers,
    per-group bucket-ordered cumulative float sum) so the oracle replays
    the estimates bit-for-bit; exact_distinct rides along per group for
    accuracy inspection."""
    from pyspark.sql.window import Window

    m = 1 << p
    regs = hll_registers(df, key_col, p, group_cols=(group_col,))
    wrun = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = (
        regs.withColumn("term", F.pow(F.lit(2.0), -F.col("register")))
        .withColumn("s_run", F.sum("term").over(wrun))
        .groupBy(group_col)
        .agg(
            F.max("s_run").alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
    )
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    return summed.join(exact, group_col).select(
        group_col,
        F.lit(m).alias("m"),
        F.col("n_present").cast("int").alias("n_nonzero"),
        F.round(_hll_corrected(m), 6).alias("hll_estimate"),
        "exact_distinct",
    )


def kmv_set_estimates(
    keys_a: DataFrame, keys_b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """One row (k, union_kth_hash, union_estimate, jaccard_estimate,
    intersection_estimate, exact_union, exact_intersection) — KMV
    SET-OPERATION estimates between two key sets (Beyer et al. 2007,
    "On synopses for distinct-value estimation over sliding windows"):
    the union sketch is the bottom-k of the two sketches' hash union
    (the KMV merge law), |A∪B|^ = (k-1)/(U_k/2^60) from its k-th
    smallest hash, Jaccard ρ^ = |{h ∈ union sketch : h ∈ sketch_A ∧ h ∈
    sketch_B}| / k, and |A∩B|^ = ρ^·|A∪B|^. The sketch-scale path for
    cross-corpus overlap: at 100 TB each side reduces to a k-row
    sketch (bottom-k is per-shard mergeable), the set algebra then
    touches only k-row frames (broadcast semi-joins), while the exact
    twin — computed here alongside for the error-bound columns — needs
    a full distinct-join of both corpora. Requires the true union to
    have >= k distinct keys (the estimator's validity regime; the row
    is empty otherwise, same as the oracle)."""
    from ..functions.hashing import md5_hash64

    def _sk(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col("key").cast("string").alias("key"))
            .distinct()
            .select(md5_hash64(F.col("key")).alias("h"))
            .orderBy("h")
            .limit(k)
        )

    sa, sb = _sk(keys_a), _sk(keys_b)
    su = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    kcap = (
        su.join(sa, "h", "left_semi")
        .join(sb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("k_cap"))
    )
    kth = su.agg(
        F.max("h").alias("union_kth_hash"), F.count(F.lit(1)).alias("nk")
    )
    da = keys_a.select(F.col("key").cast("string").alias("key")).distinct()
    db = keys_b.select(F.col("key").cast("string").alias("key")).distinct()
    ex = (
        da.unionByName(db)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("ng"))
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(F.when(F.col("ng") == 2, 1).otherwise(0))
            .cast("long")
            .alias("exact_intersection"),
        )
    )
    f = F.col("union_kth_hash").cast("double") / F.lit(float(1 << 60))
    ue = F.lit(float(k - 1)) / f
    rho = F.col("k_cap").cast("double") / F.lit(float(k))
    return (
        kth.filter(F.col("nk") == k)
        .crossJoin(kcap)
        .crossJoin(ex)
        .select(
            F.lit(k).alias("k"),
            "union_kth_hash",
            F.round(ue, 6).alias("union_estimate"),
            F.round(rho, 6).alias("jaccard_estimate"),
            F.round(rho * ue, 6).alias("intersection_estimate"),
            "exact_union",
            "exact_intersection",
        )
    )
