"""Distributed BPE trainer vs the scalar reference implementation."""

from collections import Counter

from geotrellis_server_spark.operators.bpe import learn_bpe_merges, reference_bpe


def test_bpe_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest",
        "low new wide low new",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id BIGINT, text STRING")
    got = learn_bpe_merges(docs, n_merges=12)

    freqs = Counter(w for t in texts for w in t.split(" "))
    want = reference_bpe(dict(freqs), 12)
    assert got == want and len(got) == 12


def test_bpe_partition_invariant(spark):
    texts = [("doc", "aa ab aa ab ba bb aa")] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    a = learn_bpe_merges(docs.repartition(8), 5)
    b = learn_bpe_merges(docs.coalesce(1), 5)
    assert a == b


def test_bpe_stops_when_exhausted(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id BIGINT, text STRING")
    merges = learn_bpe_merges(docs, n_merges=50)
    # 'ab</w>' fully merges in 2 steps; trainer must stop, not loop
    assert 1 <= len(merges) <= 3


def test_bpe_encode_matches_greedy_reference(spark):
    from geotrellis_server_spark.operators.bpe import (
        bpe_encode,
        learn_bpe_merges,
        reference_bpe,
    )

    texts = ["low lower lowest", "new newer newest low", "wide wider new"]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id STRING, text STRING")
    merges = learn_bpe_merges(docs, 10)
    got = {r.doc_id: (list(r.tokens), r.n_tokens)
           for r in bpe_encode(docs, merges).collect()}

    # independent scalar greedy application of the same table
    ranks = {m: i for i, m in enumerate(merges)}
    def enc(word):
        syms = list(word) + ["</w>"]
        while True:
            pairs = [(ranks[(syms[i], syms[i+1])], i)
                     for i in range(len(syms)-1) if (syms[i], syms[i+1]) in ranks]
            if not pairs:
                return syms
            _, i = min(pairs)
            syms[i:i+2] = [syms[i] + syms[i+1]]
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in enc(w)]
        assert got[str(i)][0] == want and got[str(i)][1] == len(want)
    # encoding is partition-invariant
    a = {r.doc_id: list(r.tokens)
         for r in bpe_encode(docs.repartition(4), merges).collect()}
    assert a == {k: v[0] for k, v in got.items()}


def test_bpe_encode_nonstring_id(spark):
    from geotrellis_server_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(7, "low low lower"), (8, "new lower")],
        "doc_id BIGINT, text STRING")
    got = {r.doc_id: r.n_tokens
           for r in bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()}
    assert set(got) == {7, 8} and got[7] > 0  # bigint ids survive
