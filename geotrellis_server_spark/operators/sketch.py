"""Distinct-count sketching — KMV (k-minimum-values) over md5 hashes.

``approx_count_distinct`` (HyperLogLog++) is Spark's built-in sketch, but
its register layout is engine-internal — no cross-engine oracle can
reproduce it. KMV (Bar-Yossef et al. 2002, "Counting distinct elements
in a data stream") is the classic alternative whose state is just the k
smallest hash values: with md5-hex hashing (identical in Spark and
DuckDB) the whole sketch is a DETERMINISTIC function of the input set,
so the driver oracle checks it hash-exactly — a sketch with an exactness
gate, not a tolerance test.

Estimator: distinct ≈ (k - 1) / U_(k), where U_(k) is the k-th smallest
hash mapped to (0, 1]. Fewer than k distinct values → the sketch IS the
exact distinct set (standard KMV fallback). Merging sketches = merging
sorted hash lists and re-truncating to k — an associative monoid, so
partial aggregation works map-side (collect_set + array_sort + slice
below; Spark's partial collect_set dedups per partition before the
exchange).

The hash→(0,1] map uses the first 13 hex digits (52 bits): every
intermediate is an exact integer below 2^53, so ANY evaluation order
yields the same double and the Spark/DuckDB results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX13_DENOM = float(16 ** 13)


def hex13_fraction_sql(h: str) -> str:
    """SQL fragment: first 13 hex chars of ``h`` → exact double in
    (0, 16^13], as digit-weighted sum (all terms exact integers)."""
    return (
        f"aggregate(sequence(1, 13), 0D, (acc, i) -> acc * 16D + "
        f"CAST(instr('0123456789abcdef', substring({h}, CAST(i AS INT), 1)) - 1 AS DOUBLE))"
    )


def kmv_estimate(
    df: DataFrame, col: str, k: int = 64, group_by: list[str] | None = None
) -> DataFrame:
    """Per-group (or global) approximate distinct count of ``col``:
    (group..., n_seen_hashes, distinct_est). ``distinct_est`` is exact
    when the group has < k distinct values, else the KMV estimate.

    Plan shape (bounded state): a hash-distinct (spillable hash
    aggregate — never an in-memory unbounded buffer), then the k
    smallest hashes via rank. Grouped: a window over the group key
    (external sort, spills to disk). Global: ``orderBy().limit(k)`` =
    TakeOrderedAndProject (per-partition bottom-k, no global sort).
    Only the ≤k winners reach the final collect, so aggregation-buffer
    state is O(k) — a high-cardinality group can spill, not OOM.

    Groups whose ``col`` is entirely NULL produce NO output row (the
    NULL pre-filter removes them before the groupBy; their true distinct
    count is 0). Callers that need every group key present should
    left-join this result onto ``df.select(group_by).distinct()`` and
    coalesce the counts to 0."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    # NULLs never enter the sketch: a NULL md5 would sort FIRST in the
    # ascending min-k, displace a real k-th hash, then vanish in
    # collect_list — size(_h) = k-1 silently flips the CASE into the
    # "exact" branch (review r4 finding; the old collect_set path
    # dropped NULLs implicitly)
    distinct_h = df.where(F.col(col).isNotNull()).select(
        *(group_by or []), F.expr(f"md5(CAST({col} AS STRING))").alias("_h1")
    ).distinct()
    if group_by:
        w = Window.partitionBy(*group_by).orderBy("_h1")
        kept = (distinct_h.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= k))
    else:
        kept = distinct_h.orderBy("_h1").limit(int(k))
    agg = (kept.groupBy(*group_by) if group_by else kept.groupBy()).agg(
        F.array_sort(F.collect_list("_h1")).alias("_h")
    )
    kth_frac = f"({hex13_fraction_sql(f'element_at(_h, {k})')} / {HEX13_DENOM!r}D)"
    est = (
        f"CASE WHEN size(_h) < {k} THEN CAST(size(_h) AS DOUBLE) "
        f"ELSE CAST({k} - 1 AS DOUBLE) / {kth_frac} END"
    )
    return agg.select(
        *(group_by or []),
        F.expr("size(_h)").alias("n_seen_hashes"),
        F.expr(est).alias("distinct_est"),
    )


def kmv_merge_sql(k: int) -> str:
    """SQL fragment merging an array-of-sketches column ``sketches``
    (each an ascending hash array) into one k-truncated sketch — the KMV
    monoid, usable in a second-level rollup (e.g. per-day sketches →
    per-month estimate without touching raw data)."""
    return f"slice(array_sort(array_distinct(flatten(sketches))), 1, {k})"


def hash_sample(
    df: DataFrame, identity_cols: list[str], k: int
) -> DataFrame:
    """Deterministic uniform sample: the k rows whose md5(identity) is
    smallest — a bottom-k-by-hash reservoir. Unlike ``df.sample`` (whose
    per-partition seeding changes with partitioning) this is a pure
    function of the DATA, so estimates built on it are reproducible
    across runs, cluster sizes, and engines (the DuckDB oracle draws the
    SAME sample). Plans as TakeOrderedAndProject: per-partition bottom-k,
    driver merge of k·P candidates — no global sort."""
    ident = ", ".join(f"CAST({c} AS STRING)" for c in identity_cols)
    h = F.expr(f"md5(concat_ws('|', {ident}))")
    return df.withColumn("_hk", h).orderBy(F.asc("_hk")).limit(int(k))


def quantile_sketch(
    df: DataFrame, col: str, identity_cols: list[str], k: int = 1024,
    probs: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from the deterministic hash sample —
    nearest-rank (no interpolation) over the k sampled values, so every
    output is an ACTUAL data value picked by integer rank: exact-oracle
    friendly and scale-independent (sample error ~ 1/sqrt(k)).
    Returns (prob, value) rows."""
    import math

    from pyspark.sql import Window

    # cache: the bottom-k scan would otherwise run twice (count + final)
    sample = hash_sample(df, identity_cols, k).select(F.col(col).alias("v")).cache()
    m = sample.count()
    # rank ties on equal v are interchangeable (same value emitted)
    ranked = sample.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.asc("v")))
    )
    # join per-prob rank targets instead of a CASE: two probs mapping to
    # the SAME nearest rank (tiny m) must each emit their row
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(float(p), max(1, math.ceil(p * m))) for p in probs],
        "prob DOUBLE, rk INT",
    )
    out = targets.join(ranked, "rk").select("prob", F.col("v").alias("value"))
    return out


def heavy_hitters_sampled(
    df: DataFrame, col: str, identity_cols: list[str], k: int = 4096,
    top_n: int = 10,
) -> DataFrame:
    """Frequent-items estimate from the hash sample: count values inside
    the deterministic k-row sample, scale by N/k. Returns the top_n
    (value, est_count) — deterministic, exact-oracle-able, and the
    sample (not the corpus) is all that ever reaches the heavy-hitter
    aggregation."""
    n_total = df.count()
    sample = hash_sample(df, identity_cols, k).cache()
    m = sample.count()
    scale = float(n_total) / float(m or 1)
    counts = (
        sample.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("_c"))
        .selectExpr("value", f"CAST(_c * CAST({scale!r} AS DOUBLE) AS DOUBLE) AS est_count",
                    "_c")
        .orderBy(F.desc("_c"), F.asc("value"))
        .limit(int(top_n))
        .drop("_c")
    )
    return counts


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows × ``width`` buckets of exact counters.
    Returns (row, bucket, count) — the sketch table. Hashing is
    md5(value # row) → first 13 hex digits mod width: deterministic and
    engine-portable, so the sketch (and every estimate) is a pure
    function of the data — exactly oracle-able like the KMV sketch.

    Build cost: ONE scan (posexplode of the depth bucket ids) + one
    (row, bucket) aggregation with map-side partials; nothing
    proportional to distinct-value count is kept (that's the point vs
    exact counts)."""
    buckets = []
    for r in range(depth):
        h = "md5(concat(CAST(" + col + " AS STRING), '#', '" + str(r) + "'))"
        buckets.append(f"CAST({hex13_fraction_sql(h)} AS BIGINT) % {width}")
    # ONE scan + posexplode (pos = hash row id), not a depth-way union of
    # scans: depth× less input I/O, and union-of-aggregates over the same
    # file relation trips Spark 4.1's scan-reuse attribute rewrite
    # ("key not found") when the sketch is later broadcast
    return (
        df.selectExpr(
            f"posexplode(array({', '.join(buckets)})) AS (row, bucket)"
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("count"))
    )


def cms_query(
    cms: DataFrame, values: DataFrame, col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: for each value, min over the depth
    rows of its bucket counters (the classic CMS upper-bound estimate;
    never undercounts). ``values`` joins the sketch on (row, bucket) —
    the sketch is small (depth×width rows) and broadcasts."""
    keyed = values.select(F.col(col).alias("value"))
    buckets = []
    for r in range(depth):
        h = "md5(concat(CAST(value AS STRING), '#', '" + str(r) + "'))"
        buckets.append(f"CAST({hex13_fraction_sql(h)} AS BIGINT) % {width}")
    # one posexplode, not a depth-way union: pos IS the hash row id
    probe = keyed.selectExpr(
        "value", f"posexplode(array({', '.join(buckets)})) AS (row, bucket)"
    )
    return (
        probe.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est_count"))
    )


ES_KEY_SCALE = 16777216.0  # 2^24 — exact power-of-two scaling


def weighted_sample(
    df: DataFrame, weight_col: str, identity_cols: list[str], k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement — Efraimidis &
    Spirakis 2006: each row gets key ln(u)/w with u = md5-derived uniform
    in (0, 1]; the k LARGEST keys are a weight-proportional sample. With
    the hash-derived u the sample is a pure function of the data
    (reproducible, engine-portable — the oracle draws the SAME rows).

    ULP-proofing: ``ln`` is the one libm call here, and two engines'
    ``ln`` may legally differ by 1 ULP — enough to flip a rank decided
    by the raw double. So the rank key is the QUANTIZED
    ``floor(ln(u)/w * 2^24)`` (power-of-two scaling is exact; floor
    yields an exact integer) with the row's md5 as deterministic
    tiebreaker. A cross-engine flip now needs ln() to land on the other
    side of a 2^-24 grid line — ~10^6 ULP away — and
    test_weighted_sample_ulp_margin proves the gate corpus keeps a wide
    margin from every boundary. Weight-scale assumption: the quantized
    key magnitude is ≤ |ln(u)|/w_min · 2^24 ≈ 37·2^24/w_min, which must
    stay below 2^53 for adjacent integers to remain representable — so
    the guarantee holds for weights ≳ 1e-7 (normalize smaller weights
    by their max before sampling; selection is scale-invariant). Plans
    as TakeOrderedAndProject; the classic op behind quality-weighted
    corpus subsetting."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ident = ", ".join(f"CAST({c} AS STRING)" for c in identity_cols)
    h = "md5(concat_ws('|', " + ident + "))"
    u = f"(({hex13_fraction_sql(h)} + 1.0D) / {float(16**13)!r}D)"
    key = f"floor(ln({u}) / CAST({weight_col} AS DOUBLE) * {ES_KEY_SCALE!r}D)"
    return (
        df.where(F.expr(f"CAST({weight_col} AS DOUBLE) > 0"))
        .withColumn("_es_key", F.expr(key))
        .withColumn("_es_tie", F.expr(h))
        .orderBy(F.desc("_es_key"), F.asc("_es_tie"))
        .limit(int(k))
        .drop("_es_key", "_es_tie")
    )


def heavy_hitters(df: DataFrame, col: str, one_in: int = 512) -> DataFrame:
    """EXACT heavy hitters — every value of string column ``col``
    appearing at least once per ``one_in`` rows, with its exact count —
    via the two-pass candidate-prune pattern (Misra-Gries/SpaceSaving
    family; the reference delegates frequent-term analytics to its
    engines, this is the Spark-native shape).

    Pass 1 (candidates): per Arrow batch, keep values with batch
    frequency ≥ n_batch/one_in. The union over batches is a SUPERSET of
    the global heavy hitters (if freq ≥ N/m globally, some batch has
    freq_b ≥ N_b/m — contrapositive of summing freq_b < N_b/m), and
    each batch emits < one_in + 1 rows, so candidate volume is bounded
    by batches × one_in regardless of column cardinality.

    Pass 2 (exact): broadcast the deduped candidates, hash-join,
    groupBy-count ONLY the candidates, filter ``n * one_in >= N``
    (integer compare — no float threshold). At 100 TB this beats a full
    groupBy when cardinality is huge (web-scale vocab): the shuffle
    carries only candidate rows; everything else dies map-side at the
    broadcast join.

    Returns (value, n) — exact counts, complete for the threshold."""
    if one_in < 1:
        raise ValueError("one_in must be >= 1")
    import pandas as _pd

    m = int(one_in)

    def _cands(batches):
        for pdf in batches:
            s = pdf[col].dropna()
            if s.empty:
                continue
            vc = s.value_counts()
            keep = vc[vc * m >= len(s)]
            yield _pd.DataFrame({"value": keep.index.astype(str)})

    total = df.count()
    candidates = (
        df.select(col)
        .mapInPandas(_cands, "value string")
        .selectExpr("value AS __hh_cand")
        .distinct()
    )
    return (
        df.join(F.broadcast(candidates), F.col(col) == F.col("__hh_cand"),
                "inner")
        .groupBy(F.col("__hh_cand").alias("value"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * m >= F.lit(int(total)))
    )


def hll_bucket_rho_sql(col: str, p: int = 12) -> tuple[str, str]:
    """Shared Spark/DuckDB SQL fragments ``(bucket_sql, rho_sql)`` — the
    two HyperLogLog register coordinates (Flajolet et al. 2007) of a
    value expression: ``bucket`` = first ``p`` bits of md5 as an integer,
    ``rho`` = 1 + number of leading zero bits of the next 52 bits (53 if
    they are all zero).

    Everything is integer arithmetic over the md5 HEX STRING — nibble
    values via ``instr('0123456789abcdef', c) - 1``, leading-zero nibbles
    via ``TRIM(LEADING '0' ...)`` — so both engines compute identical
    registers and the sketch table itself can be oracle-gated exactly
    (same trick as KMV above; Spark's HLL++ registers are engine-internal
    and unverifiable). ``p`` must be a multiple of 4 (whole hex chars)."""
    if p % 4 != 0 or not 4 <= p <= 24:
        raise ValueError("p must be a multiple of 4 in [4, 24]")
    nchars = p // 4
    hx = "0123456789abcdef"
    h = f"md5(CAST({col} AS STRING))"
    bucket = " + ".join(
        f"(instr('{hx}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    )
    tail = f"TRIM(LEADING '0' FROM substring({h}, {nchars + 1}, 13))"
    first = f"substring({tail}, 1, 1)"
    rho = (
        f"CASE WHEN {tail} = '' THEN 53 "
        f"ELSE (13 - length({tail})) * 4 + 1 + "
        f"(CASE WHEN {first} = '1' THEN 3 "
        f"      WHEN {first} IN ('2','3') THEN 2 "
        f"      WHEN {first} IN ('4','5','6','7') THEN 1 "
        f"      ELSE 0 END) END"
    )
    return f"CAST({bucket} AS INT)", f"CAST({rho} AS INT)"


def hll_sketch(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """HyperLogLog register table for ``col``: (bucket INT, rho_max INT),
    ≤ 2^p rows. One narrow scan → hash groupBy with map-side partial max
    — the shuffle carries at most 2^p rows PER PARTITION regardless of
    input size, so at 100 TB the exchange is a few MB. The register
    table is a pure function of the input SET (dedup-invariant,
    order-invariant), which is what makes it exactly oracle-checkable;
    it is also the HLL monoid state (merge = groupBy bucket, max)."""
    bucket, rho = hll_bucket_rho_sql(col, p)
    return (
        df.where(F.col(col).isNotNull())
        .selectExpr(f"{bucket} AS bucket", f"{rho} AS rho")
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL register tables (same ``p``): union → per-bucket max.
    Associative + commutative + idempotent, so per-day sketches roll up
    to per-month estimates without touching raw data."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> float:
    """HyperLogLog estimate from a register table — the standard
    bias-corrected harmonic mean with the small-range linear-counting
    correction (Flajolet et al. 2007 §4). Collects ≤ 2^p integer rows
    (bounded driver state by construction; 2^12 = 32 KiB)."""
    import math

    m = 1 << p
    rows = sketch.collect()
    if p >= 7:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    z = float(m - len(rows))  # empty buckets contribute 2^-0 = 1
    for r in rows:
        z += 2.0 ** (-int(r.rho_max))
    est = alpha * m * m / z
    n_empty = m - len(rows)
    if est <= 2.5 * m and n_empty > 0:
        est = m * math.log(m / n_empty)
    return est


# --- Bloom filter (join pruning) --------------------------------------------
#
# The 100-TB use case: before a shuffle join, build a Bloom filter over
# the SMALL side's join keys, ship it to every task (a few KB), and
# filter the BIG side map-side — rows that cannot match never enter the
# exchange. Spark's own runtime row-level filtering does this opaquely;
# this is the explicit, oracle-checkable version (deterministic md5
# hashes, so even the false-positive set is reproducible cross-engine).


def _bloom_word_mask_sql(col: str, j: int, m_bits: int) -> tuple[str, str]:
    """(word, mask) SQL for hash function ``j`` of value ``col``: bit
    position = hex13(md5(val#j)) % m, packed 32 bits per BIGINT word
    (1 << 31 stays in BIGINT range in every engine)."""
    h = hex13_fraction_sql(f"md5(concat(CAST({col} AS STRING), '#{j}'))")
    pos = f"(CAST({h} AS BIGINT) % {m_bits})"
    # integer floor-div, NOT '/' — Spark '/' is double division and
    # CAST(double AS INT) truncates while DuckDB's CAST rounds
    return (f"CAST({pos} DIV 32 AS INT)",
            f"CAST(shiftleft(1L, CAST({pos} % 32 AS INT)) AS BIGINT)")


def bloom_build(df: DataFrame, col: str, m_bits: int = 4096,
                k: int = 4) -> DataFrame:
    """Bloom filter register table for the SET of ``col`` values:
    (word INT, bits BIGINT), ≤ m_bits/32 rows, 32 bits packed per word.
    One scan → k row-local (word, mask) pairs per value → groupBy(word)
    bit-OR with map-side partials: the exchange carries ≤ m/32 rows per
    partition regardless of input size. Pure function of the input set
    (dedup/order/partition-invariant → exactly oracle-checkable) and the
    Bloom monoid state (merge = union + groupBy bit_or)."""
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    pairs = ", ".join(
        "struct({} AS word, {} AS mask)".format(
            *_bloom_word_mask_sql(col, j, m_bits))
        for j in range(1, k + 1))
    return (
        df.where(F.col(col).isNotNull())
        .selectExpr(f"explode(array({pairs})) AS s")
        .select(F.col("s.word").alias("word"), F.col("s.mask").alias("mask"))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(df: DataFrame, col: str, words: dict[int, int],
                m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` MIGHT be in the set behind a
    Bloom register table (false positives possible — deterministic —
    false negatives impossible). ``words`` is the collected register
    table {word: bits} (≤ m_bits/32 longs — bounded driver state by
    construction, the same class as a broadcast blocklist).

    The probe is a row-local literal-array lookup — zero shuffle, zero
    join: the plan is scan → filter, so it composes map-side with any
    downstream join at any scale."""
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    arr = ", ".join(
        f"{int(words.get(w, 0))}L" for w in range(m_bits // 32))
    checks = []
    for j in range(1, k + 1):
        word, mask = _bloom_word_mask_sql(col, j, m_bits)
        checks.append(
            f"(element_at(array({arr}), {word} + 1) & {mask}) = {mask}")
    return df.where(F.col(col).isNotNull()).where(F.expr(" AND ".join(checks)))


def bloom_prefilter_join(big: DataFrame, small: DataFrame, big_col: str,
                         small_col: str, m_bits: int = 4096,
                         k: int = 4) -> DataFrame:
    """Bloom-prefiltered equi-join: build the filter over the small
    side's keys, excise non-matching big-side rows MAP-SIDE, then join.
    At 100 TB the exchange shrinks by the big side's non-match fraction
    (often >90% in star-schema probes) for the cost of one small-side
    scan and a few-KB broadcast literal."""
    words = {int(r["word"]): int(r["bits"])
             for r in bloom_build(small, small_col, m_bits, k).collect()}
    pruned = bloom_probe(big, big_col, words, m_bits, k)
    return pruned.join(F.broadcast(small), pruned[big_col] == small[small_col])


# --- KMV set operations (theta-sketch style) --------------------------------


def kmv_set_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Bottom-k DISTINCT md5 hashes of ``col`` — the KMV set sketch.
    distinct → orderBy → limit(k) plans as partial-agg +
    TakeOrderedAndProject: every partition contributes at most k rows,
    the driver holds at most k·P then k. Deterministic (md5), so two
    engines build the identical sketch."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.md5(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_set_ops(df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str,
                k: int = 256) -> DataFrame:
    """Distinct-count set algebra from two KMV sketches (the theta-
    sketch estimators, Dasgupta et al. / Beyer et al.): with
    θ = min(θ_A, θ_B) (each θ the k-th smallest distinct hash as an
    exact fraction of 2⁵², or 1 when the set has < k distinct values),

        |A ∪ B| ≈ |{h ∈ S_A ∪ S_B : h < θ}| / θ
        |A ∩ B| ≈ |{h ∈ S_A ∩ S_B : h < θ}| / θ

    Returns ONE row: (n_a, n_b, union_est, intersect_est, jaccard_est)
    — n_a/n_b the retained-hash counts. Every quantity is exact
    arithmetic (hash fractions are integer-valued doubles over the
    power-of-two denominator 16¹³ = 2⁵², so the divisions are single
    correctly-rounded IEEE ops — cross-engine reproducible bit-for-bit).

    Scale shape: each input collapses to ≤ k rows before any cross-set
    work; the set algebra itself runs on 2k rows. Sketches of a
    partitioned corpus can be unioned first (KMV is a monoid under
    merge-then-rebottom-k)."""
    frac = f"({hex13_fraction_sql('h')} / {HEX13_DENOM!r}D)"
    sa = kmv_set_sketch(df_a, col_a, k).withColumn("in_a", F.lit(1))
    sb = kmv_set_sketch(df_b, col_b, k).withColumn("in_b", F.lit(1))
    both = sa.join(sb, "h", "full").select(
        "h", F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
        F.expr(frac).alias("f"))
    thetas = both.agg(
        F.expr(f"IF(sum(in_a) >= {k}, max(IF(in_a = 1, f, 0D)), 1.0D)")
        .alias("ta"),
        F.expr(f"IF(sum(in_b) >= {k}, max(IF(in_b = 1, f, 0D)), 1.0D)")
        .alias("tb"),
    ).selectExpr("least(ta, tb) AS theta")
    return (
        both.join(F.broadcast(thetas))
        .agg(
            F.sum("in_a").cast("long").alias("n_a"),
            F.sum("in_b").cast("long").alias("n_b"),
            F.expr("CAST(count_if(f < theta) AS DOUBLE) / any_value(theta)")
            .alias("union_est"),
            F.expr("CAST(count_if(f < theta AND in_a = 1 AND in_b = 1) "
                   "AS DOUBLE) / any_value(theta)").alias("intersect_est"),
            F.expr("CAST(count_if(f < theta AND in_a = 1 AND in_b = 1) "
                   "AS DOUBLE) / CAST(count_if(f < theta) AS DOUBLE)")
            .alias("jaccard_est"),
        )
    )


def hash_sample_per_group(
    df: DataFrame, group_cols: list[str], identity_cols: list[str], k: int
) -> DataFrame:
    """Deterministic per-group uniform sample: within every group, the k
    rows whose md5(identity) is smallest — the grouped twin of
    :func:`hash_sample` (balanced per-source/lang subsetting: "10k docs
    from EVERY source", immune to source skew). Pure function of the
    data → reproducible across runs, partitionings, and engines.

    Scale shape: one window per group key ordered by the hash —
    external-sort backed (spills, never OOMs); with input already
    partitioned by the group key the exchange is free. NULL group keys
    form their own group, matching SQL GROUP BY."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    ident = ", ".join(f"CAST({c} AS STRING)" for c in identity_cols)
    h = F.expr(f"md5(concat_ws('|', {ident}))")
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_hk"))
    return (
        df.withColumn("_hk", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_hk", "_rn")
    )


def quantiles_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """EXACT per-group nearest-rank quantiles: for each group and each
    p the value at rank ceil(p * n) of the group's sorted non-NULL
    values (nearest-rank definition — always an actual data value, so
    results are engine-exact with no interpolation ambiguity).
    Returns (group..., p, value).

    Scale shape: one row_number window per group key (external sort,
    spills) + a tiny per-group count aggregate; the rank targets join
    back on (group, rank) — only |groups| x |probs| rows move in the
    final join. The global-sample alternative is quantile_sketch; this
    is the exact small-cardinality-groups path (per-source latency
    percentiles, per-language length quantiles)."""
    if not probs or any(not (0.0 < p <= 1.0) for p in probs):
        raise ValueError("probs must be in (0, 1]")
    from pyspark.sql import Window

    vals = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = vals.select(*group_cols,
                         F.col(value_col).alias("_v")) \
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy(*group_cols).orderBy("_v")))
    counts = vals.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    probs_df = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double")
    targets = counts.crossJoin(F.broadcast(probs_df)).select(
        *group_cols, "p",
        F.expr("CAST(ceil(p * _n) AS INT)").alias("_rn"))
    return (targets.join(ranked, [*group_cols, "_rn"])
            .select(*group_cols, "p", F.col("_v").alias("value")))


def value_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sigmas: int = 3,
    scale: int = 100,
) -> DataFrame:
    """EXACT z-score anomaly flags without ever computing a float mean
    or stddev: quantize values to integers (x = floor(v * scale)), then
    flag rows where

        (n*x - S)^2 > sigmas^2 * (n*SS - S^2)

    — the |x - mean| > sigmas * stddev_pop test cross-multiplied into
    pure BIGINT arithmetic (LHS = n^2*(x-mean)^2, RHS = sigmas^2 * n^2 *
    variance). Returns the flagged rows: (group..., id-columns..., x_q).
    Engine-exact: both sides are integers, no rounding anywhere.

    Magnitude bound: |n*x| and n*SS must stay below 2^63 — holds while
    n * scale^2 * max_v^2 < 2^63 (e.g. a billion rows of values < 300
    at scale 100). Beyond that, run per finer group or post-aggregate
    DECIMAL. Scale shape: one map-side-combined (n, S, SS) aggregate
    per group, broadcast back onto the row stream — one pass plus a
    broadcast join, no sort."""
    if sigmas < 1 or scale < 1:
        raise ValueError("sigmas and scale must be >= 1")
    x = (f"CAST(floor(CAST({value_col} AS DOUBLE) * {float(scale)!r}D) "
         f"AS BIGINT)")
    q = df.where(F.col(value_col).isNotNull()) \
        .withColumn("_x", F.expr(x))
    stats = q.groupBy(*group_cols).agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum(F.expr("_x * _x")).alias("_ss"))
    s2 = sigmas * sigmas
    joined = (q.crossJoin(F.broadcast(stats)) if not group_cols
              else q.join(F.broadcast(stats), list(group_cols)))
    return (joined
            .where(F.expr(
                f"(_n * _x - _s) * (_n * _x - _s) > "
                f"{s2} * (_n * _ss - _s * _s)"))
            .drop("_n", "_s", "_ss")
            .withColumnRenamed("_x", "x_q"))
