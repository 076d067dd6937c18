"""Query algebra: QueryFSpec parity (core/src/test/.../QueryFSpec.scala) —
JSON round-trip, 4-source catalog golden, And/Or semantics, the
Contains≡covers quirk, half-open vs inclusive Between."""

import datetime as dt

import pytest

from geotrellis_server_spark.query import ast as Q
from geotrellis_server_spark.query.compile import (
    eval_df,
    ogc_layer_predicate,
    raster_source_predicate,
)
from geotrellis_server_spark.sources.synth import catalog_fixture

UTC = dt.timezone.utc


def _dt(month: int) -> dt.datetime:
    return dt.datetime(2020, month, 1, 0, 0, 1, tzinfo=UTC)


def test_json_roundtrip():
    q = (
        Q.intersects((0, 0, 2, 2))
        .and_(Q.intersects((1, 1, 4, 4)))
        .and_(Q.at(_dt(2)))
        .or_(Q.with_name("x").and_(Q.between(_dt(1), _dt(3))))
    )
    assert Q.Query.from_json(q.to_json()) == q


def test_json_shape_matches_reference():
    # node/key naming parity with QueryFSpec golden JSON (:43-130)
    d = Q.intersects((0, 0, 2, 2)).and_(Q.at(_dt(2))).to_dict()
    assert set(d) == {"And"}
    assert set(d["And"]) == {"left", "right"}
    assert set(d["And"]["left"]) == {"Intersects"}
    assert "projectedGeometry" in d["And"]["left"]["Intersects"]
    g = d["And"]["left"]["Intersects"]["projectedGeometry"]["geometry"]
    assert g["type"] == "Polygon" and len(g["coordinates"][0]) == 5
    assert d["And"]["right"]["At"]["fieldName"] == "time"


def test_unknown_node_degrades_to_nothing():
    assert Q.Query.from_dict({"Bogus": {}}) == Q.Nothing()


def test_queryfspec_catalog_golden(spark):
    # the exact 4-source store: intersects(ex2) ∧ intersects(ex3) ∧ at(dt2)
    # → ["second", "third"] (QueryFSpec.scala:225-250)
    cat = catalog_fixture(spark)
    q = Q.intersects((1, 1, 4, 4)).and_(Q.intersects((2, 2, 5, 5))).and_(Q.at(_dt(2)))
    got = sorted(r.name for r in cat.filter(raster_source_predicate(q)).collect())
    assert got == ["second", "third"]
    # direct AST, JSON round-trip, and list-semantics paths agree
    got2 = sorted(r.name for r in cat.filter(raster_source_predicate(Q.Query.from_json(q.to_json()))).collect())
    got3 = sorted(r.name for r in eval_df(q, cat).collect())
    assert got2 == got and got3 == got


def test_contains_is_covers_quirk(spark):
    cat = catalog_fixture(spark)
    # (1.5, 1.5, 2, 2) is covered by "second" (1,1,4,4) but not by "first"
    # (0,0,2,2)? first covers it too ((1.5,1.5,2,2) ⊆ (0,0,2,2)). third
    # (2,2,5,5) does not. Contains must behave EXACTLY like covers.
    q_cov = Q.covers((1.5, 1.5, 2.0, 2.0))
    q_con = Q.contains((1.5, 1.5, 2.0, 2.0))
    names_cov = sorted(r.name for r in cat.filter(raster_source_predicate(q_cov)).collect())
    names_con = sorted(r.name for r in cat.filter(raster_source_predicate(q_con)).collect())
    assert names_cov == names_con == ["first", "second"]


def test_between_half_open_vs_inclusive(spark):
    cat = catalog_fixture(spark)
    # raster-source Between is [t1, t2): t2 = dt2 excludes the dt2 sources
    q = Q.between(_dt(1), _dt(2))
    got = sorted(r.name for r in cat.filter(raster_source_predicate(q)).collect())
    assert got == ["first"]
    # ogc-layer Between is endpoint-overlap inclusive; catalog uses times
    # array — a layer AT dt2 overlaps [dt1, dt2]
    import pyspark.sql.functions as F

    ogc = cat.select(
        "name", "xmin", "ymin", "xmax", "ymax",
        F.array("time").alias("times"),
        F.lit(None).cast("timestamp").alias("t_start"),
        F.lit(None).cast("timestamp").alias("t_end"),
    )
    got2 = sorted(r.name for r in ogc.filter(ogc_layer_predicate(q)).collect())
    assert got2 == ["first", "second", "third"]


def test_ogc_empty_time_matches_everything(spark):
    import pyspark.sql.functions as F

    cat = catalog_fixture(spark).select(
        "name", "xmin", "ymin", "xmax", "ymax",
        F.lit(None).cast("array<timestamp>").alias("times"),
        F.lit(None).cast("timestamp").alias("t_start"),
        F.lit(None).cast("timestamp").alias("t_end"),
    )
    q = Q.at(_dt(7))
    assert cat.filter(ogc_layer_predicate(q)).count() == 4
    # raster-source semantics: missing time never matches
    cat2 = catalog_fixture(spark).select(
        "name", "xmin", "ymin", "xmax", "ymax", F.lit(None).cast("timestamp").alias("time")
    )
    assert cat2.filter(raster_source_predicate(q)).count() == 0


def test_or_concat_duplicates_in_list_semantics(spark):
    cat = catalog_fixture(spark)
    q = Q.with_name("first").or_(Q.intersects((0, 0, 0.5, 0.5)))
    # both branches match "first" → list semantics duplicates it
    rows = [r.name for r in eval_df(q, cat).collect()]
    assert sorted(rows) == ["first", "first"]
    # column semantics dedups (engine set semantics)
    assert [r.name for r in cat.filter(raster_source_predicate(q)).collect()] == ["first"]


def test_analysis_and_override():
    q = Q.with_name("a").and_(Q.at(_dt(1)))
    assert q.is_temporal()
    # reference algebraIsUniversal: At is non-universal, And = &&
    assert not q.is_universal()
    assert Q.with_name("a").is_universal()
    assert not Q.intersects((0, 0, 1, 1)).is_universal()
    assert not Q.nothing().is_universal()
    # Or with one universal branch IS universal (reference: e1 || e2)
    assert Q.all_().or_(Q.intersects((0, 0, 1, 1))).is_universal()
    assert not Q.with_name("a").is_temporal()
    q2 = q.override_name("b")
    assert q2 == Q.with_name("b").and_(Q.at(_dt(1)))


def test_nothing_all(spark):
    cat = catalog_fixture(spark)
    assert cat.filter(raster_source_predicate(Q.nothing())).count() == 0
    assert cat.filter(raster_source_predicate(Q.all_())).count() == 4
