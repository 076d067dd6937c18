"""Text analysis + multimodal plumbing tests."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from geotrellis_server_spark.operators import multimodal as MM
from geotrellis_server_spark.operators import text as TX
from geotrellis_server_spark.sources import synth


def test_text_stats_hand_computed(spark):
    df = spark.createDataFrame([(1, "the quick fox")], "doc_id LONG, text STRING")
    r = TX.text_stats(df).collect()[0]
    assert r.n_chars == 13 and r.n_tokens == 3
    assert abs(r.stopword_ratio - 1 / 3) < 1e-12
    assert r.punct_ratio == 0.0
    assert abs(r.avg_token_len - 11 / 3) < 1e-12


def test_quality_score_bounds(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    st = TX.text_stats(docs)
    mm = st.agg(F.min("quality_score"), F.max("quality_score")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0
    assert st.count() == docs.count()


def test_token_count(spark):
    df = spark.createDataFrame([(1, "a bb ccc dddd")], "doc_id LONG, text STRING")
    r = TX.token_count(df).collect()[0]
    assert r.ws_tokens == 4
    assert r.bpe_tokens_est == int(np.ceil(13 / 4))


def test_lang_id_markers(spark):
    rows = [(1, "the cat and the hat of things"), (2, "el gato de la casa"),
            (3, "xyzzy plugh")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.lang_pred for r in TX.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "und"


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    fp = {r.doc_id: r.fingerprint for r in TX.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_media_pipeline_deterministic(spark):
    docs = synth.docs(spark, 300)
    media = MM.synth_media(spark, docs)
    rows = media.collect()
    assert len(rows) > 0
    assert {r.kind for r in rows} <= {"image", "audio", "video"}
    # deterministic across runs
    again = {r.media_ref: bytes(r.payload) for r in MM.synth_media(spark, docs).collect()}
    for r in rows:
        assert again[r.media_ref] == bytes(r.payload)


def test_feature_extraction_shapes(spark):
    docs = synth.docs(spark, 200)
    media = MM.synth_media(spark, docs)
    feats = MM.extract_features(media, feature_dim=16).collect()
    assert len(feats) == media.count()
    for r in feats[:10]:
        assert len(r.feature) == 16
        if r.kind == "image":
            assert (r.width, r.height) == (8, 8)


def test_resize_plumbing(spark):
    docs = synth.docs(spark, 200)
    media = MM.synth_media(spark, docs)
    n_img = media.filter("kind = 'image'").count()
    out = MM.resize_images(media, size=(4, 4)).collect()
    assert len(out) == n_img
    for r in out[:5]:
        assert len(r.pixels) == 4 * 4 * 3
