"""CQL2-text parser (query/cql2.py) — golden ASTs, precedence,
escapes, geometry bbox reduction, and honest subset errors."""

import datetime as dt

import pytest

from geotrellis_server_spark.query import ast as Q
from geotrellis_server_spark.query.cql2 import parse_cql2

UTC = dt.timezone.utc


def test_name_and_bbox_and_interval():
    q = parse_cql2(
        "name = 'layer-1' AND S_INTERSECTS(geom, BBOX(-10, 40, 5, 55)) "
        "AND T_DURING(time, INTERVAL('2020-01-01T00:00:00Z', "
        "'2020-06-01T00:00:00Z'))")
    want = Q.And(
        Q.And(Q.WithName("layer-1"), Q.Intersects((-10.0, 40.0, 5.0, 55.0))),
        Q.Between(dt.datetime(2020, 1, 1, tzinfo=UTC),
                  dt.datetime(2020, 6, 1, tzinfo=UTC), field_name="time"))
    assert q == want
    assert q.is_temporal() and not q.is_universal()


def test_or_precedence_and_parens():
    a = parse_cql2("name = 'a' OR name = 'b' AND name = 'c'")
    # AND binds tighter than OR
    assert a == Q.Or(Q.WithName("a"), Q.And(Q.WithName("b"), Q.WithName("c")))
    b = parse_cql2("(name = 'a' OR name = 'b') AND name = 'c'")
    assert b == Q.And(Q.Or(Q.WithName("a"), Q.WithName("b")), Q.WithName("c"))


def test_in_list_and_quote_escape():
    q = parse_cql2("collection IN ('x', 'y''z')")
    assert q == Q.WithNames(frozenset({"x", "y'z"}))
    assert parse_cql2("id = 'it''s'") == Q.WithName("it's")


def test_polygon_reduces_to_bbox_for_intersects():
    q = parse_cql2(
        "S_INTERSECTS(geom, POLYGON((0 0, 4 0, 4 3, 1 5, 0 0)))")
    assert q == Q.Intersects((0.0, 0.0, 4.0, 5.0))


def test_polygon_under_contains_is_rejected():
    # bbox is only a sound approximation for S_INTERSECTS; a bbox-based
    # S_CONTAINS would wrongly exclude layers (over-constrained)
    with pytest.raises(ValueError, match="S_CONTAINS"):
        parse_cql2("S_CONTAINS(geom, POLYGON((0 0, 4 0, 4 3, 1 5, 0 0)))")


def test_t_equals():
    q = parse_cql2("T_EQUALS(datetime, TIMESTAMP('2021-03-04T05:06:07Z'))")
    assert q == Q.At(dt.datetime(2021, 3, 4, 5, 6, 7, tzinfo=UTC),
                     field_name="datetime")


def test_json_roundtrip_of_parsed_query():
    q = parse_cql2("name = 'n' AND S_INTERSECTS(geom, BBOX(1, 2, 3, 4))")
    assert Q.Query.from_json(q.to_json()) == q


@pytest.mark.parametrize("bad, msg", [
    ("NOT name = 'a'", "NOT"),
    ("price > 10", "CQL2"),
    ("S_INTERSECTS(geom, LINESTRING(0 0, 1 1))", "geometry"),
    ("name = 'a' name = 'b'", "trailing"),
    ("T_DURING(time, '2020-01-01T00:00:00Z')", "INTERVAL"),
])
def test_subset_errors_are_loud(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_cql2(bad)
