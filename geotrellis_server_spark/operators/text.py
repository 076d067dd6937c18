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
