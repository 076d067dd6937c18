"""Explicit hot-key salting (SURVEY.md O11 — a north-rule requirement:
"explicit salting of hot H3 cells ... AQE skew-join handling").

Where each mechanism applies at 10^12-doc scale:
- plain counts/sums → partial (map-side) aggregation already collapses
  hot keys; no salting needed.
- per-key JOINS on a skewed key → AQE skew-join splitting (enabled in
  session.py) or ``salted_join`` below when the build side can be
  replicated.
- per-key COLLECT/UDF aggregations (collect_list, applyInPandas) have NO
  partial aggregation — one reducer receives the whole hot key. These
  need explicit salting: phase 1 aggregates (key, salt) sub-groups,
  phase 2 merges the ≤ n_salt sub-results per key.

Salt is deterministic — ``pmod(xxhash64(id), n_salt)`` — so re-runs and
checkpoint resumes partition identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    key_cols: list[str],
    threshold: float = 0.01,
    max_keys: int = 64,
    sample_fraction: float | None = 0.05,
    safety_factor: float = 0.5,
    seed: int = 7,
) -> list[tuple]:
    """Keys holding more than ``threshold`` of all rows.

    Default path is SAMPLED (VERDICT r1 item 9: the exact variant did two
    full passes before the real aggregation): ONE scan samples
    ``sample_fraction`` of rows into a per-key count, which is persisted
    so the sampled total is derived by re-aggregating the (tiny) count
    table, not by a second scan. The sampled cut-off is relaxed by
    ``safety_factor`` so true hot keys are detected with overwhelming
    probability (a key at the threshold has ~threshold·fraction·N sampled
    rows; halving the cut-off puts it many σ clear). False positives are
    harmless — salting a lukewarm key only adds one tiny merge step.

    ``sample_fraction=None`` → exact single-scan variant (same persist
    trick, no sampling). When the sample lands too few rows for the
    statistics to hold (small table — a just-over-threshold key may get
    ZERO sampled rows), the sampled path falls back to the exact one;
    the extra scan is cheap exactly when it triggers.
    """
    src = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    cut = threshold * (safety_factor if sample_fraction else 1.0)
    cnts = src.groupBy(*key_cols).count().persist()
    try:
        total = cnts.agg(F.sum("count")).first()[0] or 0
        if sample_fraction and total < 2000:
            return detect_hot_keys(
                df, key_cols, threshold, max_keys, sample_fraction=None
            )
        rows = (
            cnts.filter(F.col("count") >= total * cut)
            .orderBy(F.desc("count"))
            .limit(max_keys)
            .collect()
        )
    finally:
        cnts.unpersist()
    return [tuple(r[k] for k in key_cols) for r in rows]


def with_salt(df: DataFrame, id_col: str, n_salt: int = 16) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int"))


def salted_collect_agg(
    df: DataFrame,
    key_cols: list[str],
    collect_col: str,
    id_col: str,
    n_salt: int = 16,
    hot_keys: list[tuple] | None = None,
) -> DataFrame:
    """collect_list aggregation that survives hot keys: hot keys aggregate
    in (key, salt) sub-groups first, then concatenate; cold keys take the
    direct single-phase path (no extra shuffle volume for the long tail).

    Returns (key_cols..., values: array)."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, key_cols)
    if not hot_keys:
        return df.groupBy(*key_cols).agg(F.collect_list(collect_col).alias("values"))

    hot_pred = None
    for hk in hot_keys:
        p = F.lit(True)
        for c, v in zip(key_cols, hk):
            p = p & (F.col(c) == F.lit(v))
        hot_pred = p if hot_pred is None else (hot_pred | p)

    cold = df.filter(~hot_pred).groupBy(*key_cols).agg(
        F.collect_list(collect_col).alias("values")
    )
    hot = (
        with_salt(df.filter(hot_pred), id_col, n_salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_list(collect_col).alias("_part"))
        .groupBy(*key_cols)
        .agg(F.flatten(F.collect_list("_part")).alias("values"))
    )
    return cold.unionByName(hot)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    id_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-proof equi-join for when the small side is too large to
    broadcast: salt the big side's rows, replicate the small side across
    all salts, join on (key, salt). Shuffle partitions for a hot key are
    split n_salt ways by construction (the explicit alternative to AQE
    skew-join when the optimizer can't see the skew, e.g. after a UDF)."""
    big_s = with_salt(big, id_col, n_salt)
    small_r = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(small_r, [key, "_salt"], "inner").drop("_salt")
