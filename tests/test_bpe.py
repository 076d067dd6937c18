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
