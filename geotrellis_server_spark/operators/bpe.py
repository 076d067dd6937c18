"""Distributed BPE merge learning — train a byte-pair-encoding
tokenizer's merge table on the corpus (Sennrich et al. 2016).

The classic scaling trick: BPE statistics depend only on the WORD
FREQUENCY table, so the corpus collapses to one row per distinct word
(groupBy word, count — map-side partials) before any merge work; at
100 TB the distinct-word table is millions of rows, not trillions.
Each merge round then:

1. counts adjacent symbol pairs weighted by word frequency — a pure
   SQL explode + groupBy (distributed, map-side combine),
2. picks the argmax pair with a DETERMINISTIC tie-break
   (count desc, pair lexicographic) via orderBy().limit(1) —
   TakeOrderedAndProject, one tiny row to the driver,
3. applies the merge to every word's symbol sequence in one Arrow
   batch pass (the merge-apply is an inherently sequential scan within
   each word — a vectorized-per-batch pandas function, never per-row
   Python in the hot loop).

State is localCheckpoint()ed per round (flat lineage — same recipe as
dedup.connected_components). ``learn_bpe_merges`` returns the ordered
merge list; ``bpe_encode`` applies it (shuffle-free scan → mapInPandas
with a per-batch word cache).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(
    docs: DataFrame, text_col: str = "text", end_mark: str = "</w>"
) -> DataFrame:
    """(word, freq, symbols) — one row per distinct word; symbols start
    as characters plus the end-of-word marker (the standard BPE init)."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where("word != ''")
    freq = words.groupBy("word").agg(F.count("*").alias("freq"))
    symbols = F.expr(
        f"concat(transform(split(word, ''), c -> c), array('{end_mark}'))"
    )
    return freq.select("word", "freq", symbols.alias("symbols"))


def _apply_merge(pdf: pd.DataFrame, a: str, b: str) -> pd.DataFrame:
    merged = a + b
    out = []
    for syms in pdf["symbols"]:
        res, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        out.append(res)
    pdf = pdf.copy()
    pdf["symbols"] = out
    return pdf


def learn_bpe_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text",
    end_mark: str = "</w>", with_counts: bool = False,
):
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in learned order — ``(a, b)`` tuples, or ``(a, b, count)``
    when ``with_counts`` (the winning pair's corpus frequency, a
    stronger golden-oracle check). Deterministic: ties on pair count
    break lexicographically, so the merge table is a pure function of
    the corpus (reproducible across runs/partitionings)."""
    state = word_freq_table(docs, text_col, end_mark).localCheckpoint()
    merges: list[tuple] = []
    pair_counts = (
        "transform(sequence(0, size(symbols) - 2), "
        "i -> struct(element_at(symbols, CAST(i AS INT) + 1) AS a, "
        "element_at(symbols, CAST(i AS INT) + 2) AS b))"
    )
    for _ in range(n_merges):
        top = (
            state.where(F.expr("size(symbols) >= 2"))
            .select("freq", F.explode(F.expr(pair_counts)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] <= 0:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b, int(top[0]["n"])) if with_counts else (a, b))

        def apply_batch(it, a=a, b=b):
            for pdf in it:
                yield _apply_merge(pdf, a, b)

        state = state.mapInPandas(
            apply_batch, "word STRING, freq BIGINT, symbols ARRAY<STRING>"
        ).localCheckpoint()
    return merges


def reference_bpe(word_freqs: dict[str, int], n_merges: int,
                  end_mark: str = "</w>", with_counts: bool = False):
    """Scalar reference implementation (same tie-break) — the test and
    golden-table oracle for the distributed trainer."""
    vocab = {w: list(w) + [end_mark] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best + (counts[best],) if with_counts else best)
        a, b = best
        for w in vocab:
            syms, res, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return merges


def bpe_encode(
    docs: DataFrame, merges: list, text_col: str = "text",
    id_col: str = "doc_id", end_mark: str = "</w>",
) -> DataFrame:
    """Apply a learned merge table to the corpus: (id, tokens, n_tokens)
    — REAL BPE token counts, not the regex estimate in operators/text.

    100-TB shape: the merge table is tiny (broadcast in the closure,
    rank dict = O(merges)); encoding is embarrassingly row-local over
    ``mapInPandas`` Arrow batches with a per-batch WORD CACHE — natural
    text re-uses words heavily, so each distinct word is merged once per
    batch, not once per occurrence. No shuffle at all: the plan is scan
    → mapInPandas."""
    ranks = {(a, b): i for i, (a, b, *_) in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        if word in cache:
            return cache[word]
        syms = list(word) + [end_mark]
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def run(batches):
        for pdf in batches:
            cache: dict = {}
            toks = [
                [t for w in str(txt).split() if w
                 for t in encode_word(w, cache)]
                for txt in pdf[text_col]
            ]
            out = pdf[[id_col]].copy()
            out["tokens"] = toks
            out["n_tokens"] = [len(t) for t in toks]
            yield out

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.mapInPandas(
        run, f"{id_col} {id_type}, tokens ARRAY<STRING>, n_tokens INT"
    )
