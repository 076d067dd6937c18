"""Text analysis operators for training-data pipelines: quality scoring,
language-ID heuristic, token counting, document fingerprinting. Every
expression is built-in SQL (whole-stage codegen, DuckDB-oracle-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("de5",),  # synthetic corpora won't hit these; fallback rules below
}


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
    quality_score) — the length/punct/stopword quality heuristics."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop_arr = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split({text_col}, ' '), t -> t IN ({stop_arr})))"
    )
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    avg_tok = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    quality = (
        F.when(n_tokens < 3, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
            + F.least(F.lit(1.0), stop_ratio * 4.0) * 0.3
            + (1.0 - F.least(F.lit(1.0), punct_ratio * 10.0)) * 0.2
        )
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                bpe_chars_per_token: float = 4.0) -> DataFrame:
    """Whitespace token count + a BPE-ish estimate (chars/4 heuristic used
    for budget accounting in training pipelines)."""
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.ceil(F.length(text_col) / F.lit(bpe_chars_per_token)).cast("bigint").alias("bpe_tokens_est"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-lexicon language heuristic: predict the language whose
    markers appear most; ties/no-hits → 'und'. Returns
    (id, lang_pred, score)."""
    toks = f"split({text_col}, ' ')"
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.expr(f"size(filter({toks}, t -> t IN ({arr})))").alias(f"_s_{lang}")
        )
    scored = docs.select(F.col(id_col), F.col(text_col), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.when(best == 0, "und")
    for l in langs:
        pred = pred.when(F.col(f"_s_{l}") == best, l)
    return scored.select(F.col(id_col), pred.alias("lang_pred"), best.alias("score"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (stable under case/extra-space edits) + a coarse locality-sensitive
    prefix fingerprint (first 2 hex chars of each quarter's md5 — a
    rolling-hash-style sketch that survives local edits elsewhere)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    quarter = "CAST(ceil(length({t}) / 4.0) AS INT)".format(t=text_col)
    parts = [
        F.substring(F.md5(F.expr(f"substring({text_col}, 1 + {i} * {quarter}, {quarter})")), 1, 2)
        for i in range(4)
    ]
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.concat(*parts).alias("sketch8"),
    )


def chunk_documents(
    docs: DataFrame, size: int = 50, overlap: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Token-window chunking — split each document into overlapping
    whitespace-token windows (the standard training-corpus preparation
    step: a 100-TB corpus chunks to fixed context windows before
    tokenization). Returns (id, chunk_id, chunk, n_chunk_tokens).

    Pure built-in SQL (split / sequence / slice / array_join inside
    posexplode) — whole-stage codegen, zero shuffle: chunking is a
    row-local map, so it composes with any upstream scan at any scale.
    The last window keeps the tail (may be shorter than ``size``)."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    step = size - overlap
    toks = f"split({text_col}, ' ')"
    n_win = (
        f"greatest(CAST(ceil((size({toks}) - {overlap}) / CAST({step} AS DOUBLE)) AS INT), 1)"
    )
    windows = (
        f"transform(sequence(0, {n_win} - 1), "
        f"i -> array_join(slice({toks}, i * {step} + 1, {size}), ' '))"
    )
    out = docs.select(
        F.col(id_col), F.expr(f"posexplode({windows}) AS (chunk_id, chunk)")
    )
    return out.withColumn(
        "n_chunk_tokens", F.size(F.split(F.col("chunk"), " "))
    )


def split_assign(
    docs: DataFrame, weights: dict[str, float] | None = None,
    id_col: str = "doc_id", salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by CONTENT HASH of the id —
    the split is a pure function of (id, salt): stable across runs,
    partitionings, cluster sizes, and engines (md5 hex is identical in
    Spark and DuckDB, so the oracle reproduces it exactly). Weights
    quantize to 1/65536 via 4-hex-digit string thresholds — string
    comparison, no integer hex parsing (portable).

    Row-local map: no shuffle at any scale; downstream consumers filter
    on the split column (partition it at write time for pruning)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    h = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))), 1, 4)
    items = list(weights.items())
    cum, expr = 0.0, None
    for name, w in items[:-1]:
        cum += w
        expr = F.when(h < _hex_thr(cum), name) if expr is None else expr.when(h < _hex_thr(cum), name)
    expr = items[-1][0] if expr is None else expr.otherwise(items[-1][0])
    return docs.select(F.col(id_col), F.lit(expr).alias("split") if isinstance(expr, str) else expr.alias("split"))


def _hex_thr(rate: float) -> str:
    """4-hex-digit string threshold for ``h < thr`` keep tests. Rates that
    round to 65536 must compare ABOVE every 4-hex string — format() would
    yield the 5-char '10000', which sorts BELOW almost all of them
    lexicographically ('e6..' > '10000'); 'g' sorts above 'ffff'."""
    v = int(round(min(max(rate, 0.0), 1.0) * 65536))
    return "g" if v >= 65536 else format(v, "04x")


def stratified_sample(
    docs: DataFrame, rates: dict[str, float], stratum_col: str,
    id_col: str = "doc_id", salt: str = "sample-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — keep a row iff the md5 hash of
    (id, salt) falls under the stratum's rate threshold. The standard
    corpus-balancing step (e.g. downsample boilerplate-heavy strata,
    upweight rare languages by keeping 100%): a pure function of
    (id, salt, stratum), so re-runs, retries, and different partitionings
    keep EXACTLY the same rows, and the oracle reproduces the sample
    row-for-row. Row-local: no shuffle, composes with any scan.

    ``rates``: stratum value → keep fraction in [0, 1], quantized to
    1/65536 (4 md5 hex digits compared as strings — portable)."""
    h = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))), 1, 4)

    expr = None
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == stratum
        branch = h < _hex_thr(rate)  # 'g' sentinel keeps rate≈1.0 total
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    expr = expr.otherwise(h < _hex_thr(default_rate))
    return docs.filter(expr)


# patterns chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded quantifiers, \\b — no lookaround
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", kinds: list[str] | None = None) -> DataFrame:
    """PII scrubbing — replace emails/SSNs/phones/IPs with <KIND> markers
    and count the redactions per kind (the standard pre-training privacy
    pass). Chained built-in regexp_replace: whole-stage codegen, zero
    shuffle, row-local — composes with any scan at any scale. Returns
    (id, redacted, n_<kind>...)."""
    kinds = kinds or list(PII_PATTERNS)
    red = F.col(text_col)
    counts = []
    for k in kinds:
        pat = PII_PATTERNS[k]
        # Spark SQL string literals process escapes ('\b' = backspace!) —
        # double the backslashes for the expr-embedded copy; the Python
        # regexp_replace API takes the raw pattern directly
        pat_sql = pat.replace("\\", "\\\\")
        counts.append(
            F.size(F.expr(f"regexp_extract_all({text_col}, '{pat_sql}', 0)")).alias(f"n_{k}")
        )
        red = F.regexp_replace(red, pat, f"<{k.upper()}>")
    return docs.select(F.col(id_col), red.alias("redacted"), *counts)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals, pure row-local SQL:
    - unique_token_ratio: |distinct tokens| / |tokens| (boilerplate and
      keyword-stuffed docs score low),
    - adjacent_repeat_frac: fraction of consecutive token pairs that are
      identical ("very very very ..." degeneracy).
    Both portable to the DuckDB oracle verbatim."""
    toks = f"split({text_col}, ' ')"
    uniq = F.expr(
        f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks})"
    ).alias("unique_token_ratio")
    adj = F.expr(
        f"CASE WHEN size({toks}) < 2 THEN 0.0 ELSE "
        f"CAST(size(filter(sequence(2, size({toks})), "
        f"i -> element_at({toks}, i) = element_at({toks}, i - 1))) AS DOUBLE) "
        f"/ (size({toks}) - 1) END"
    ).alias("adjacent_repeat_frac")
    return docs.select(F.col(id_col), uniq, adj)


def pack_sequences(
    docs: DataFrame, capacity: int = 256, n_packers: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-capacity bins —
    the sample-packing step before pretraining (fill each context window
    with several short documents instead of padding).

    Deterministic distributed recipe: docs are routed to ``n_packers``
    independent packer groups by ``id % n_packers`` (each group is a
    shard of the corpus), ordered inside the group by
    (ws_tokens DESC, id) — first-fit-decreasing order — and packed with
    a sequential NEXT-FIT pass (current bin until the next doc would
    overflow, then open a new bin; an oversized doc gets its own bin).
    The per-group pass is the only sequential step and runs once per
    group in applyInPandas; groups are independent, so at 100 TB
    ``n_packers`` scales with the cluster and no packer ever sees more
    than corpus/n_packers rows. Packing quality is within a few percent
    of global FFD for shuffled corpora while keeping the algorithm
    embarrassingly parallel AND reproducible (bin ids are a pure
    function of the corpus, not of execution order).

    Returns (id, packer, bin_id, bin_offset, ws_tokens): bin_id counts
    bins within the packer from 0; bin_offset is the token offset of
    this doc inside its bin."""
    import pandas as pd

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_packers <= 0:
        raise ValueError(f"n_packers must be positive, got {n_packers}")
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_packers).alias("packer"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ws_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins, offs = [], []
        cum, b = 0, 0
        for tok in pdf["ws_tokens"]:
            tok = int(tok)
            if bins and cum + tok <= capacity:
                cum += tok
            else:
                b = b + 1 if bins else 0
                cum = tok
            bins.append(b)
            offs.append(cum - tok)
        pdf["bin_id"] = bins
        pdf["bin_offset"] = offs
        return pdf[[id_col, "packer", "ws_tokens", "bin_id", "bin_offset"]]

    return base.groupBy("packer").applyInPandas(
        pack,
        f"{id_col} BIGINT, packer BIGINT, ws_tokens INT, bin_id INT, bin_offset INT",
    )


def blocklist_filter(
    docs: DataFrame, blocked: DataFrame, col: str = "source"
) -> DataFrame:
    """Curation blocklist filter: drop documents whose ``col`` (source /
    domain) appears in the blocklist. The blocklist is the broadcast
    side (a domain blocklist is thousands of rows; the corpus is the
    10^12 side) — a broadcast left_anti join, so the corpus never
    shuffles and the filter runs map-side."""
    keys = blocked.select(col).distinct()
    return docs.join(F.broadcast(keys), col, "left_anti")


def extract_urls(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, domain) — one row per http(s) URL found in the text
    (regexp_extract_all + explode, all JVM-side). ``domain`` strips the
    scheme and path for blocklist joins."""
    urls = f"regexp_extract_all({text_col}, 'https?://[^\\\\s]+', 0)"
    return (
        docs.select(F.col(id_col), F.explode(F.expr(urls)).alias("url"))
        # prose punctuation glued to the URL ('...com, then') would break
        # blocklist equi-joins on domain — strip it from the tail
        .withColumn("url", F.regexp_replace("url", r"""[.,;:!?)\]'"]+$""", ""))
        .withColumn(
            "domain",
            F.expr("regexp_extract(url, 'https?://([^/\\\\s]+)', 1)"),
        )
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tie_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """The k best rows per group ("keep the top-k highest-quality docs
    per domain") with a combiner phase so the shuffle is bounded.

    Phase 1 (local prune, mapInPandas): within every Arrow batch, keep
    only the top-k per group present in that batch. The global top-k is
    a subset of the union of batch-local top-ks (any row outside a
    batch top-k has ≥ k better rows in its own batch alone), so this is
    lossless — and the exchange now carries ≤ k rows per (group, batch)
    instead of the whole table. This is the map-side-combine shape a
    plain row_number() window lacks: at 100 TB a hot domain no longer
    ships every row to one reducer before discarding all but k.

    Phase 2 (exact): row_number() over the pruned set. ``tie_col``
    (default: first group col is NOT enough — pass the id) makes the
    order total so results are deterministic and oracle-checkable.
    Output: input columns + ``rank`` (1..k)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if tie_col is None:
        raise ValueError("pass tie_col (a unique column) for deterministic ranks")
    from pyspark.sql import Window

    schema = df.schema
    gcols = list(group_cols)

    def _prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                # match Spark's NULL ordering (asc = NULLS FIRST,
                # desc = NULLS LAST) or the batch-local prune can drop
                # NULL-ordered rows the phase-2 window would rank <= k
                pdf.sort_values([order_col, tie_col],
                                ascending=[not descending, True],
                                na_position="last" if descending else "first")
                .groupby(gcols, sort=False, dropna=False)  # NULL group keys are groups too
                .head(k)
            )

    pruned = df.mapInPandas(_prune, schema)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*gcols).orderBy(oc, F.col(tie_col).asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_stats(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer retrieval statistics for a fixed query-term set: one row
    per (doc, matching term) with the term frequency ``tf``, the doc's
    token length ``dl``, and the term's document frequency ``df_t`` —
    everything BM25/tf-idf needs, all integers so the driver oracle
    matches exactly (the float score lives in :func:`bm25_score`).

    Plan: one scan computing tf per term via size(filter(tokens)) —
    no explode, no join for tf; df_t is a tiny per-term aggregate
    (≤ len(terms) rows) joined back broadcast. The corpus never
    shuffles."""
    toks = f"split({text_col}, ' ')"
    sel = [F.col(id_col), F.expr(f"size({toks})").alias("dl")]
    for i, t in enumerate(terms):
        esc = t.replace("'", "''")
        sel.append(F.expr(f"size(filter({toks}, x -> x = '{esc}'))").alias(f"_tf{i}"))
    base = docs.select(*sel)
    pairs = ", ".join(f"'{t.replace(chr(39), chr(39) * 2)}', _tf{i}"
                      for i, t in enumerate(terms))
    long = (
        base.selectExpr(id_col, "dl", f"stack({len(terms)}, {pairs}) AS (term, tf)")
        .where(F.col("tf") > 0)
    )
    df_t = long.groupBy("term").agg(F.count("*").alias("df_t"))
    return long.join(F.broadcast(df_t), "term").select(
        id_col, "term", "tf", "dl", "df_t")


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score): Okapi BM25 over the fixed term set, from
    :func:`bm25_stats` plus the corpus-level constants (N, avgdl — two
    broadcast scalars). idf = ln(1 + (N - df + 0.5)/(df + 0.5))."""
    stats = bm25_stats(docs, terms, text_col, id_col)
    consts = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    scored = stats.join(F.broadcast(consts)).withColumn(
        "contrib",
        F.expr(
            f"ln(1D + (n_docs - df_t + 0.5D) / (df_t + 0.5D)) * "
            f"(tf * ({k1!r}D + 1D)) / "
            f"(tf + {k1!r}D * (1D - {b!r}D + {b!r}D * dl / avgdl))"
        ),
    )
    return scored.groupBy(id_col).agg(F.sum("contrib").alias("score"))


def line_dedup_keep_first(
    docs: DataFrame,
    tokens_per_line: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global line-level deduplication, C4/RefinedWeb style: split every
    document into fixed token-window "lines", keep each distinct line
    only at its FIRST occurrence corpus-wide (ordered by (doc, line
    position)), drop every other copy, and reassemble the surviving
    lines into cleaned documents. Boilerplate that repeats across a
    crawl (headers, nav text, license blurbs) vanishes everywhere but
    its first sighting.

    Output: (id, clean_text, n_lines_kept, n_lines_total). Documents
    whose every line is a duplicate disappear from the output (their
    clean text would be empty).

    Scale shape: the canonical-occurrence choice is a groupBy(line) →
    min(struct(doc, pos)) AGGREGATE — map-side partial min makes the
    hottest line (an empty boilerplate string repeated 10^9 times)
    collapse to one row per partition before the exchange, so no
    skew-salting is needed — followed by an equi-join back on the
    winning (line, doc, pos) triple. Reassembly is a per-doc
    collect_list bounded by document size."""
    lines = (
        chunk_documents(docs, size=tokens_per_line, overlap=0,
                        text_col=text_col, id_col=id_col)
        .select(F.col(id_col), F.col("chunk_id").alias("line_no"),
                F.col("chunk").alias("line"))
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines_total"))
    winners = lines.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("line_no").alias("p"))
              ).alias("w")
    ).select("line", F.col("w.d").alias(id_col), F.col("w.p").alias("line_no"))
    kept = lines.join(winners, ["line", id_col, "line_no"], "inner")
    return (
        kept.groupBy(id_col)
        .agg(
            F.expr("array_join(transform(array_sort(collect_list("
                   "struct(line_no, line))), s -> s.line), ' ')"
                   ).alias("clean_text"),
            F.count("*").alias("n_lines_kept"),
        )
        .join(totals, id_col)
        .select(id_col, "clean_text", "n_lines_kept", "n_lines_total")
    )


def repeated_span_dedup(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style repeated-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    k-token window whose exact text occurs ≥2 times corpus-wide (in any
    document, at any position — including twice inside ONE document)
    marks all k token positions of EVERY occurrence as duplicated; all
    marked tokens are removed and the survivors reassembled. Unlike
    :func:`line_dedup_keep_first` no occurrence is spared — repeated
    boilerplate vanishes entirely, the ExactSubstr semantics.

    The suffix-array formulation of the paper is inherently
    single-machine; this is the distributed re-expression: fixed-k
    fingerprints (md5 of the window text) stand in for the "duplicated
    substring ≥ threshold" test, so a repeated span of length L ≥ k is
    detected by its L−k+1 covering windows and excised exactly.

    Output: (id, clean_text, n_tokens_kept, n_tokens_total) for EVERY
    input document — fully-scrubbed docs stay, with empty clean_text.
    Docs shorter than k tokens carry no window and survive whole.

    Scale shape: window fingerprints are row-local (one transform over
    the token array, no explode of text bytes — the shuffle carries
    32-char hashes + positions, never token text). The repeat test is a
    groupBy(hash) count — map-side partial aggregation collapses the
    hottest boilerplate hash to one row per partition before the
    exchange, so no salting is needed — followed by an equi-join back
    on the hash (both sides already hash-partitioned by the join key).
    Mask assembly is a per-doc collect bounded by document length."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    grams = (
        toks.where(F.size("toks") >= k)
        .select(
            F.col(id_col),
            F.explode(F.expr(
                f"transform(sequence(0, size(toks) - {k}), i -> "
                f"struct(i AS pos, md5(array_join(slice(toks, i + 1, {k}),"
                f" ' ')) AS g))")).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )
    repeated = (grams.groupBy("g").agg(F.count("*").alias("c"))
                .where(F.col("c") >= 2).select("g"))
    covered = (
        grams.join(repeated, "g")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("ps"))
        .select(
            F.col(id_col),
            F.expr(f"array_distinct(flatten(transform(ps, p -> "
                   f"sequence(p, p + {k - 1}))))").alias("cov"))
    )
    kept = F.expr(
        "filter(transform(toks, (t, i) -> struct(t AS t, i AS i)), "
        "s -> cov IS NULL OR NOT array_contains(cov, s.i))")
    return (
        toks.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(F.transform(kept, lambda s: s["t"]), " "
                         ).alias("clean_text"),
            F.size(kept).cast("long").alias("n_tokens_kept"),
            F.size("toks").cast("long").alias("n_tokens_total"),
        )
    )


def dsir_importance(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed unigram+bigram
    bag-of-ngrams features; each raw document's importance log-weight is

        log w(doc) = Σ_b c_doc[b] · (ln p_target[b] − ln p_raw[b])

    with add-1-smoothed bucket distributions (p[b] = (c[b]+1)/(N+B)).
    High-weight docs look like the target corpus — the standard
    pretraining data-selection signal.

    Determinism: the per-bucket log-ratio is floor-quantized to 2⁻²⁰
    (BIGINT quanta) before the per-doc sum, so the aggregation is exact
    integer arithmetic — partition/order-invariant and cross-engine
    reproducible; a 1-ULP ln() divergence only matters if a ratio lands
    within ~2⁻³² of a quantum boundary (margin-checked in tests).

    Output: (id, logw_q, n_feats) for EVERY raw doc — logw_q in 2⁻²⁰
    units, n_feats = gram count (2·len−1).

    Scale shape: gram hashing is row-local (md5 → exact-double hex13 →
    bucket). Both corpus distributions are groupBy(bucket) counts onto
    ≤n_buckets rows — map-side partials collapse each partition to ≤B
    rows before the exchange. The ratio table (B rows) is
    BROADCAST-joined onto the raw-doc gram stream, and the only wide
    exchange is the final groupBy(doc) sum of BIGINTs, again map-side
    combined. Nothing is collected to the driver."""
    B = int(n_buckets)
    if B > 16 ** 5:
        raise ValueError(f"n_buckets must be <= 16^5, got {B}")
    # Spark sequence(1, 0) is DESCENDING [1, 0] — a single-token doc
    # would index element_at(toks, 2) out of bounds; guard with CASE
    gram_expr = (
        "concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), i -> "
        "concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
        "ELSE array() END)")
    # 6 hex digits (16^6 = 16.7M >> B) keep the per-gram hash lambda
    # less than half the cost of the full 13-digit fraction — this runs
    # once per gram on BOTH model-count and scoring passes
    bucket = (
        "CAST(aggregate(sequence(1, 6), 0D, (acc, i) -> acc * 16D + "
        "CAST(instr('0123456789abcdef', substring(md5(g), "
        f"CAST(i AS INT), 1)) - 1 AS DOUBLE)) AS BIGINT) % {B}")

    def _grams(docs: DataFrame) -> DataFrame:
        return (
            docs.select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("toks"))
            .where(F.size("toks") >= 1)
            .select(F.col(id_col), F.explode(F.expr(gram_expr)).alias("g"))
            .select(F.col(id_col), F.expr(bucket).alias("b"))
        )

    raw_g = _grams(raw_docs)
    tgt_c = _grams(target_docs).groupBy("b").agg(F.count("*").alias("ct"))
    raw_c = raw_g.groupBy("b").agg(F.count("*").alias("cr"))
    totals = (
        raw_c.agg(F.sum("cr").alias("nr"))
        .join(tgt_c.agg(F.sum("ct").alias("nt")))
    )
    # every bucket seen in raw_g has cr>=1 by construction; target counts
    # fill in by left join (absent -> 0, the +1 smoothing keeps ln finite)
    ratio = (
        raw_c.join(tgt_c, "b", "left")
        .join(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"CAST(floor((ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)) - "
                f"ln(CAST(nt + {B} AS DOUBLE)) - "
                f"ln(CAST(cr + 1 AS DOUBLE)) + "
                f"ln(CAST(nr + {B} AS DOUBLE))) * 1048576.0D) AS BIGINT)"
            ).alias("q"),
        )
    )
    return (
        raw_docs.select(id_col)
        .join(
            raw_g.join(F.broadcast(ratio), "b")
            .groupBy(id_col)
            .agg(F.sum("q").alias("logw_q"),
                 F.count("*").cast("long").alias("n_feats")),
            id_col, "left")
        # EVERY raw doc comes out — NULL/empty text scores a neutral 0
        .select(F.col(id_col),
                F.coalesce("logw_q", F.lit(0)).cast("long").alias("logw_q"),
                F.coalesce("n_feats", F.lit(0)).cast("long")
                .alias("n_feats"))
    )


def ngram_lm_logprob(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM document scoring, the CCNet-style quality signal
    (Wenzek et al. 2020 filter corpora by LM perplexity): train add-1-
    smoothed bigram/unigram counts on ``train_docs`` (default: ``docs``
    itself), then score every doc by its total bigram log-probability

        lp(doc) = Σ_{(w1,w2) ∈ doc} ln( (c2(w1,w2)+1) / (c1(w1)+V) )

    Low (more negative per bigram) means far from the training
    distribution — gibberish, boilerplate, wrong language.

    Output: (id, logprob_q, n_bigrams) for EVERY doc. logprob_q is the
    sum of per-bigram log-probs each floor-quantized to 2⁻²⁰ — integer
    arithmetic after the quantize, so the result is exact, partition-
    invariant and cross-engine reproducible (divide by n_bigrams for
    the mean; docs with <2 tokens score 0 over 0 bigrams).

    Scale shape: bigram extraction is row-local. Both model tables and
    the vocabulary scalar come out of ONE pass over the train corpus —
    a row-local (token, bigram-or-NULL) pair stream aggregated by
    (w1, bg) with map-side partials (bigram-vocab-sized), locally
    checkpointed so every consumer reads the materialized table
    instead of re-running the corpus pass. The bigram string embeds
    its first word, so c2 is the non-NULL rows as-is and c1 is a
    per-w1 sum over the tiny table. Scoring joins the doc-bigram stream to the model on the
    bigram string and the first word — plain equi-joins that AQE
    converts to broadcast when the model fits, skew-handled by AQE.
    Every doc rides the scoring stream itself (docs with <2 tokens
    contribute one NULL sentinel row via explode_outer), so the final
    per-doc sum is one map-side-combined exchange keyed by doc with NO
    corpus-sized join-back. Output: one row per distinct id."""
    train = train_docs if train_docs is not None else docs

    def _toks(d: DataFrame) -> DataFrame:
        return d.select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("toks"))

    bigram_expr = (
        "transform(sequence(1, size(toks) - 1), i -> struct("
        "element_at(toks, i) AS w1, concat(element_at(toks, i), ' ', "
        "element_at(toks, i + 1)) AS bg))")

    # one train pass: every token becomes (w1, bg) with bg = NULL for a
    # doc's final token — c1 counts all w1 rows, c2 the non-NULL bgs
    pair_expr = (
        "transform(sequence(1, size(toks)), i -> struct("
        "element_at(toks, i) AS w1, "
        "CASE WHEN i < size(toks) THEN concat(element_at(toks, i), ' ', "
        "element_at(toks, i + 1)) END AS bg))")
    pairs = (_toks(train)
             .select(F.explode(F.expr(pair_expr)).alias("s"))
             .select(F.col("s.w1").alias("w1"), F.col("s.bg").alias("bg")))
    # distinct (w1, bg) pairs collapse in the map-side partials; bg
    # embeds w1 (tokens are space-split), so each non-NULL bg occurs in
    # exactly one pair row — c2 needs no second aggregation
    grouped = (pairs.groupBy("w1", "bg")
               .agg(F.count("*").alias("c"))
               .localCheckpoint(eager=True))
    c1 = grouped.groupBy("w1").agg(F.sum("c").alias("c1"))
    c2 = (grouped.where("bg IS NOT NULL")
          .select("bg", F.col("c").alias("c2")))
    vocab = c1.agg(F.count("*").alias("v"))

    # docs with <2 tokens explode_outer to a single NULL row: they miss
    # both model joins, score NULL (-> 0) and count 0 bigrams, and the
    # per-doc aggregate covers EVERY doc without a second corpus join
    doc_bg = (_toks(docs)
              .select(F.col(id_col),
                      F.explode_outer(
                          F.when(F.size("toks") >= 2,
                                 F.expr(bigram_expr))).alias("s"))
              .select(id_col, F.col("s.w1").alias("w1"),
                      F.col("s.bg").alias("bg")))
    return (
        doc_bg
        .join(c2, "bg", "left")
        .join(c1, "w1", "left")
        .join(F.broadcast(vocab))
        .select(
            F.col(id_col), F.col("bg"),
            F.expr(
                "CASE WHEN bg IS NOT NULL THEN "
                "CAST(floor((ln(CAST(coalesce(c2, 0) + 1 AS DOUBLE)) - "
                "ln(CAST(coalesce(c1, 0) + v AS DOUBLE))) * 1048576.0D) "
                "AS BIGINT) END").alias("q"))
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("q"), F.lit(0)).cast("long")
             .alias("logprob_q"),
             F.count("bg").cast("long").alias("n_bigrams"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keywords by tf-idf over the FULL corpus
    vocabulary (keyword extraction / salient-term tagging — the
    unsupervised complement of :func:`bm25_stats`' fixed-term
    retrieval): (id, term, rank, score_q) with

        score_q = tf(term, doc) * floor(ln(N / df(term)) * 2^20)

    N = corpus document count, df = documents containing the term.
    The idf is floor-quantized BEFORE the tf multiply, so scores are
    BIGINTs — exact, and the (score desc, term asc) top-k tie-break is
    total. Corpus-wide terms (df = N) score 0 but can still rank when
    a short doc has nothing rarer.

    Scale shape: tf is a groupBy(doc, term) count of the row-local
    token stream (map-side partials); df is a groupBy(term) count of
    the distinct (doc, term) pairs tf already produced — no second
    scan. The vocab-sized idf table joins back on term (AQE broadcasts
    when it fits) and the top-k is a row_number window partitioned by
    doc — a per-doc sort, never global."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    n_docs = docs.count()  # bounded: one scalar
    tf = (docs.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), " "))
                      .alias("term"))
          .where(F.col("term") != "")
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    idf = tf.groupBy("term").agg(F.expr(
        f"CAST(floor(ln(CAST({n_docs} AS DOUBLE) / count(*)) * "
        f"1048576.0D) AS BIGINT)").alias("idf_q"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_q").desc(), F.col("term"))
    return (tf.join(idf, "term")
            .select(F.col(id_col), "term",
                    (F.col("tf") * F.col("idf_q")).alias("score_q"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term", F.col("rank").cast("int"),
                    F.col("score_q").cast("long")))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS local-similarity algorithm): hash every k-token
    gram, slide a window of ``w`` consecutive hashes, select each
    window's minimum (ties to the RIGHTMOST occurrence), deduplicate
    positions. Any shared token run of length >= k + w - 1 between two
    documents is GUARANTEED to share a selected fingerprint — the
    density/guarantee trade-off the paper proves optimal.

    Returns (id, pos, fp): pos = 1-based gram index of the selection,
    fp = the 52-bit md5-prefix hash (conv(substring(md5, 1, 13)) —
    exact in both engines, so selections match bit-for-bit). Docs with
    fewer than k tokens emit nothing; docs with fewer than w grams get
    one whole-doc window.

    Scale shape: completely ROW-LOCAL — gram hashing and window
    selection are array lambdas inside one projection, zero shuffle at
    any corpus size; the only exchange is the final per-doc distinct
    (bounded by selections-per-doc ~ 2·m/w). Downstream near-dup joins
    group on fp, exactly like the repeated-span hash join."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = f"split({text_col}, ' ')"
    gram = f"concat_ws(' ', slice({toks}, i, {k}))"
    hashes = (f"transform(sequence(1, size({toks}) - {k} + 1), i -> "
              f"CAST(conv(substring(md5({gram}), 1, 13), 16, 10) "
              f"AS BIGINT))")
    # lw = actual window (whole doc when m < w); n_win windows
    sel = (
        f"transform(sequence(1, greatest(size(hs) - {w} + 1, 1)), j -> "
        f"named_struct("
        f"'pos', j + least({w}, size(hs)) - array_position("
        f"reverse(slice(hs, j, least({w}, size(hs)))), "
        f"array_min(slice(hs, j, least({w}, size(hs))))), "
        f"'fp', array_min(slice(hs, j, least({w}, size(hs))))))")
    return (docs
            .where(F.expr(f"size({toks}) >= {k}"))
            .select(F.col(id_col), F.expr(hashes).alias("hs"))
            .select(F.col(id_col), F.explode(F.expr(sel)).alias("s"))
            .select(F.col(id_col), F.col("s.pos").cast("int").alias("pos"),
                    F.col("s.fp").alias("fp"))
            .distinct())


def winnow_containment_pairs(
    docs: DataFrame,
    theta_num: int = 1,
    theta_den: int = 2,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric containment detection over winnowing fingerprints —
    the MOSS report step: pairs (a, b), a < b, where the SMALLER
    fingerprint set shares at least theta_num/theta_den of itself with
    the other document. Catches quote/wrapper/boilerplate containment
    that symmetric Jaccard misses (a short doc fully quoted inside a
    long one has tiny Jaccard but containment 1.0).

    Returns (id_a, id_b, shared, n_a, n_b) for pairs passing
        shared * theta_den >= theta_num * least(n_a, n_b)
    — all integers, engine-exact.

    Scale shape: the candidate generator is an equi-join ON fp of the
    two distinct-fingerprint relations (never all-pairs; a corpus-wide
    boilerplate fingerprint is a hot key — AQE skew-split absorbs it,
    and the distinct-fps-per-doc bound caps each doc's join fan-out at
    ~2m/w). The verify is a groupBy(a, b) count with map-side partials
    joined back to the tiny per-doc fingerprint counts."""
    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col,
                              id_col=id_col).select(
        F.col(id_col), "fp").distinct()
    counts = fps.groupBy(id_col).agg(F.count("*").alias("n"))
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    shared = (a.join(b, "fp")
              .where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("shared")))
    return (shared
            .join(counts.select(F.col(id_col).alias("id_a"),
                                F.col("n").alias("n_a")), "id_a")
            .join(counts.select(F.col(id_col).alias("id_b"),
                                F.col("n").alias("n_b")), "id_b")
            .where(F.expr(f"shared * {theta_den} >= "
                          f"{theta_num} * least(n_a, n_b)"))
            .select("id_a", "id_b", "shared",
                    F.col("n_a").cast("long"), F.col("n_b").cast("long")))


def canonical_url_expr(url_col: str, dialect: str = "spark") -> str:
    """SQL expression canonicalizing a URL column — the crawl-dedup
    key normalization (lowercase scheme+host, strip #fragment, default
    :80/:443 ports, leading www., trailing path slashes; sort query
    parameters). Pure string/regex builtins evaluated identically by
    Spark and DuckDB (the oracle uses this same string)."""
    # regex hygiene for engine portability: Spark SQL string literals
    # process backslash escapes, DuckDB's do not — so the SAME string
    # only means the same regex if it contains no backslashes; character
    # classes ([.] [?]) replace \. \? and (?i) supplies case folding
    u = f"regexp_replace({url_col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '(?i)^(https?)://', 1))"
    host = (f"regexp_replace(regexp_replace(lower(regexp_extract({u}, "
            f"'(?i)^https?://([^/?#]+)', 1)), '^www[.]', ''), "
            f"':(80|443)$', '')")
    path = (f"regexp_replace(regexp_extract({u}, "
            f"'(?i)^https?://[^/?#]+([^?#]*)', 1), '/+$', '')")
    q = f"regexp_extract({u}, '[?]([^#]*)', 1)"
    # split/array_sort are shared names; ONLY the list-join differs
    # (Spark array_join vs DuckDB array_to_string) — the single
    # dialect-switched token in an otherwise engine-identical string
    join_fn = "array_join" if dialect == "spark" else "array_to_string"
    qsorted = f"{join_fn}(array_sort(split({q}, '&')), '&')"
    return (f"concat({scheme}, '://', {host}, {path}, "
            f"CASE WHEN {q} = '' THEN '' "
            f"ELSE concat('?', {qsorted}) END)")


def url_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact URL-level dedup over canonicalized URLs (the first pass of
    every crawl pipeline — one fetch per canonical URL): extract ->
    canonicalize (row-local) -> groupBy canonical form. Returns
    (canon_url, n_refs, survivor_id) with the smallest referencing doc
    as survivor. One map-side-combined exchange keyed by the canonical
    string; hot boilerplate URLs collapse in the partial aggregate."""
    urls = extract_urls(docs, text_col=text_col, id_col=id_col)
    return (urls
            .select(F.col(id_col),
                    F.expr(canonical_url_expr("url")).alias("canon_url"))
            .groupBy("canon_url")
            .agg(F.count("*").alias("n_refs"),
                 F.min(id_col).alias("survivor_id")))


def pmi_pairs(
    docs: DataFrame,
    window: int = 5,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks 1990): unordered token pairs co-occurring within a ``window``
    of positions, scored

        pmi_q = floor( ln(N * c_xy / (c_x * c_y)) * 2^20 )

    where N = total co-occurrence pair count, c_x = times x appears in
    any pair, c_xy = the pair count. Pairs are canonically ordered
    (w1 <= w2); only pairs with c_xy >= min_count emerge. The ln is
    floor-quantized (the dsir doctrine) so scores are exact BIGINTs.

    Scale shape: pair generation is row-local (array lambdas emit each
    position's <= window-1 forward partners); the only exchanges are
    map-side-combined counts keyed by pair and by word, plus the final
    broadcast of the vocabulary-sized word counts onto the
    min_count-filtered pair table. The min_count filter applies BEFORE
    the join, so rare noise never travels."""
    if window < 2:
        raise ValueError("window must be >= 2")
    toks = f"split({text_col}, ' ')"
    pairs_expr = (
        f"flatten(transform(sequence(1, size({toks}) - 1), i -> "
        f"transform(sequence(i + 1, least(i + {window - 1}, "
        f"size({toks}))), j -> CASE WHEN element_at({toks}, i) <= "
        f"element_at({toks}, CAST(j AS INT)) THEN "
        f"concat(element_at({toks}, i), ' ', element_at({toks}, "
        f"CAST(j AS INT))) ELSE concat(element_at({toks}, "
        f"CAST(j AS INT)), ' ', element_at({toks}, i)) END)))")
    pair_stream = (docs
                   .where(F.expr(f"size({toks}) >= 2"))
                   .select(F.explode(F.expr(pairs_expr)).alias("pair")))
    c_xy = pair_stream.groupBy("pair").agg(F.count("*").alias("c_xy"))
    words = pair_stream.select(
        F.explode(F.split("pair", " ")).alias("w"))
    c_w = words.groupBy("w").agg(F.count("*").alias("c_w"))
    n_tot = pair_stream.count()  # one scalar
    kept = c_xy.where(F.col("c_xy") >= int(min_count))
    return (kept
            .withColumn("w1", F.expr("split(pair, ' ')[0]"))
            .withColumn("w2", F.expr("split(pair, ' ')[1]"))
            .join(F.broadcast(c_w.withColumnRenamed("w", "w1")
                              .withColumnRenamed("c_w", "c1")), "w1")
            .join(F.broadcast(c_w.withColumnRenamed("w", "w2")
                              .withColumnRenamed("c_w", "c2")), "w2")
            .select("pair", "c_xy", F.expr(
                f"CAST(floor(ln(CAST({n_tot} AS DOUBLE) * c_xy / "
                f"(CAST(c1 AS DOUBLE) * c2)) * 1048576.0D) AS BIGINT)")
                .alias("pmi_q")))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher document-quality rule signals (Rae et al. 2021, App. A1.1
    — the public MassiveWeb filter every modern pretraining pipeline
    descends from), computed entirely in row-local codegen SQL with the
    keep verdict decided by INTEGER cross-multiplication (never a float
    ratio), so flags are partition- and engine-exact:

    - word count in [min_words, max_words],
    - mean word length in [3, 10]        -> 3*W <= chars <= 10*W,
    - symbol-to-word ratio <= 0.1        -> 10*(#hash + #ellipsis) <= W,
    - bullet-started lines <= 90%        -> 10*bullets <= 9*lines,
    - ellipsis-ended lines <= 30%        -> 10*ellipses <= 3*lines,
    - words with an alphabetic char >= 80% -> 5*alpha >= 4*W,
    - >= 2 distinct Gopher stop words present.

    Returns the full signal table (one row per doc: the counts plus the
    per-rule flags and final ``keep``) — the artifact a curation run
    audits; filtering is ``WHERE keep``. Zero shuffle: every column is
    a scalar expression over the document row."""
    t = text_col
    words = f"filter(split(translate({t}, '\\n', ' '), ' '), w -> w <> '')"
    lines = f"split({t}, '\\n')"
    stop_arr = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    exprs = {
        "n_words": f"size({words})",
        "n_word_chars": f"aggregate({words}, 0L, (a, w) -> a + length(w))",
        "n_symbols": (
            f"(length({t}) - length(replace({t}, '#', ''))) + "
            f"CAST((length({t}) - length(replace({t}, '...', ''))) / 3 AS BIGINT)"),
        "n_lines": f"size({lines})",
        "n_bullet_lines": (
            f"size(filter({lines}, l -> substr(ltrim(l), 1, 1) IN "
            f"('-', '*', '•')))"),
        "n_ellipsis_lines": f"size(filter({lines}, l -> l LIKE '%...'))",
        "n_alpha_words": f"size(filter({words}, w -> w RLIKE '[a-zA-Z]'))",
        "n_stop_hits": (
            f"size(array_intersect(array_distinct({words}), "
            f"array({stop_arr})))"),
    }
    d = docs.select(F.col(id_col),
                    *[F.expr(e).cast("long").alias(k)
                      for k, e in exprs.items()])
    rules = {
        "ok_word_count": f"n_words >= {int(min_words)} AND n_words <= {int(max_words)}",
        "ok_word_len": "3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words",
        "ok_symbols": "10 * n_symbols <= n_words",
        "ok_bullets": "10 * n_bullet_lines <= 9 * n_lines",
        "ok_ellipsis": "10 * n_ellipsis_lines <= 3 * n_lines",
        "ok_alpha": "5 * n_alpha_words >= 4 * n_words",
        "ok_stopwords": "n_stop_hits >= 2",
    }
    d = d.select("*", *[F.expr(e).alias(k) for k, e in rules.items()])
    return d.withColumn("keep", F.expr(" AND ".join(rules)))


def c4_line_rules(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    line_no_col: str = "line_no",
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — the public Common
    Crawl filter behind T5), re-expressed over a line table
    ``(doc_id, line_no, line)``:

    line kept iff (1) ≥ 5 words, (2) ends in terminal punctuation
    (. ! ? or closing quote), (3) carries no policy/boilerplate marker
    (javascript / terms of use / privacy policy / cookie);
    doc kept iff ≥ 3 kept lines (the paper's ≥3-sentence rule, with
    kept punctuated lines as the sentence proxy) and no line contains
    "lorem ipsum" or "{" (the code marker).

    Returns one audit row per doc: (doc_id, n_lines, n_kept, has_lorem,
    has_brace, keep, clean_md5) where clean_md5 fingerprints the
    retained lines in order ('|'-joined) — the gate hashes the actual
    cleaned content without shipping it.

    All verdicts are integer/string predicates (no floats), engine- and
    partitioning-exact. Scale shape: every line verdict is row-local
    codegen; the only exchange is ONE map-side-combined groupBy(doc) —
    and the md5 reassembly is bounded by document size."""
    w = f"size(filter(split({line_col}, ' '), x -> x <> ''))"
    last = f"substr(rtrim({line_col}), -1, 1)"
    lo = f"lower({line_col})"
    keep = (
        f"({w}) >= 5 AND ({last}) IN ('.', '!', '?', '\"') "
        f"AND NOT ({lo} LIKE '%javascript%' OR {lo} LIKE '%terms of use%' "
        f"OR {lo} LIKE '%privacy policy%' OR {lo} LIKE '%cookie%')"
    )
    per_line = lines.select(
        F.col(id_col),
        F.col(line_no_col).alias("_ln"),
        F.col(line_col).alias("_line"),
        F.expr(keep).alias("_keep"),
        F.expr(f"{lo} LIKE '%lorem ipsum%'").alias("_lorem"),
        F.expr(f"{line_col} LIKE '%{{%'").alias("_brace"),
    )
    agg = per_line.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.expr("CAST(_keep AS INT)")).alias("n_kept"),
        F.max("_lorem").alias("has_lorem"),
        F.max("_brace").alias("has_brace"),
        F.expr(
            "md5(CAST(array_join(transform(array_sort(collect_list("
            "CASE WHEN _keep THEN struct(_ln, _line) END)), s -> s._line),"
            " '|') AS BINARY))"
        ).alias("clean_md5"),
    )
    return agg.withColumn(
        "keep",
        F.expr("n_kept >= 3 AND NOT has_lorem AND NOT has_brace"),
    )


def fineweb_rules(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
) -> DataFrame:
    """FineWeb custom quality filters (Penedo et al. 2024 §3.6 — the
    three line-statistics rules they added on top of the Gopher/C4
    battery), integer-cross-multiplied so every verdict is exact:

    - punctuation-line ratio ≥ 0.12   → 25·punct_lines ≥ 3·n_lines
    - duplicated-line char fraction ≤ 0.1 → 10·dup_chars ≤ total_chars
      (a line duplicated WITHIN the document counts all its copies)
    - short-line (<30 chars) ratio ≤ 0.67 → 3·short_lines ≤ 2·n_lines

    Returns one audit row per doc with the counts, per-rule flags and
    ``keep``. Scale shape: one (doc, line) aggregate collapses
    duplicate lines map-side (the hot boilerplate line combines before
    the exchange), then one map-side-combined per-doc aggregate."""
    per_line = (
        lines.groupBy(F.col(id_col), F.col(line_col).alias("_l"))
        .agg(F.count("*").alias("_n"))
        .select(
            F.col(id_col), F.col("_n"),
            F.expr("length(_l)").cast("long").alias("_len"),
            F.expr("substr(rtrim(_l), -1, 1) IN ('.', '!', '?', '\"')")
            .alias("_punct"),
            F.expr("length(_l) < 30").alias("_short"),
        )
    )
    d = per_line.groupBy(id_col).agg(
        F.sum("_n").alias("n_lines"),
        F.sum(F.expr("CASE WHEN _punct THEN _n ELSE 0 END"))
        .alias("n_punct_lines"),
        F.sum(F.expr("CASE WHEN _short THEN _n ELSE 0 END"))
        .alias("n_short_lines"),
        F.sum(F.expr("CASE WHEN _n > 1 THEN _n * _len ELSE 0 END"))
        .alias("dup_chars"),
        F.sum(F.expr("_n * _len")).alias("total_chars"),
    )
    rules = {
        "ok_punct": "25 * n_punct_lines >= 3 * n_lines",
        "ok_dup": "10 * dup_chars <= total_chars",
        "ok_short": "3 * n_short_lines <= 2 * n_lines",
    }
    d = d.select("*", *[F.expr(e).alias(k) for k, e in rules.items()])
    return d.withColumn("keep", F.expr(" AND ".join(rules)))
