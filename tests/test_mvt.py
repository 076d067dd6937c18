"""MVT sink (styles/mvt.py) — hand-computed wire-format golden,
decoder round-trip, determinism, and the Spark tile sink."""

import pytest

from geotrellis_server_spark.styles import mvt


def test_varint_zigzag():
    assert mvt._varint(0) == b"\x00"
    assert mvt._varint(127) == b"\x7f"
    assert mvt._varint(128) == b"\x80\x01"
    assert mvt._varint(300) == b"\xac\x02"  # protobuf docs example
    assert mvt._zigzag(0) == 0 and mvt._zigzag(-1) == 1
    assert mvt._zigzag(1) == 2 and mvt._zigzag(-2) == 3
    for v in (0, 1, -1, 63, -64, 4096, -4096):
        assert mvt._unzigzag(mvt._zigzag(v)) == v


def test_single_point_golden_bytes():
    """Hand-assembled expected bytes for one point (5, 7) with n=2 —
    independent of the encoder's internals."""
    layer = mvt.encode_point_layer("pts", [(5, 7, {"n": 2})], extent=4096)
    # feature body: tags field 2 = [0, 0]; type field 3 = 1 (POINT);
    # geometry field 4 = [cmd MoveTo|1<<3 = 9, zz(5)=10, zz(7)=14]
    feat_body = bytes([0x12, 0x02, 0x00, 0x00,   # tags
                       0x18, 0x01,               # type
                       0x22, 0x03, 0x09, 0x0A, 0x0E])  # geometry
    want = (
        bytes([0x78, 0x02])                     # version (15): 2
        + bytes([0x0A, 0x03]) + b"pts"          # name (1)
        + bytes([0x12, len(feat_body)]) + feat_body  # feature (2)
        + bytes([0x1A, 0x01]) + b"n"            # key (3)
        + bytes([0x22, 0x02, 0x30, 0x04])       # value (4): sint64 zz(2)=4
        + bytes([0x28, 0x80, 0x20])             # extent (5): 4096
    )
    assert layer == want


def test_decode_roundtrip_multi():
    feats = [(0, 0, {"n": 1}), (100, 50, {"n": 3}), (4095, 4095, {"n": 1})]
    data = mvt.encode_tile([mvt.encode_point_layer("p", feats)])
    layers = mvt.decode_tile(data)
    assert len(layers) == 1
    lay = layers[0]
    assert lay["version"] == 2 and lay["name"] == "p"
    assert lay["extent"] == 4096
    got = mvt.decode_points(lay)
    assert sorted(got) == sorted(feats)


def test_deterministic_bytes():
    feats = [(3, 9, {"n": 2}), (1, 2, {"n": 5}), (7, 2, {"n": 2})]
    a = mvt.encode_point_layer("p", feats)
    b = mvt.encode_point_layer("p", list(reversed(feats)))
    assert a == b  # sorted features + first-use key order


def test_spark_sink_tiles(spark):
    pts = spark.createDataFrame(
        [(float(-180 + (i % 8) * 40 + 0.5), float(-60 + (i % 4) * 30 + 0.5))
         for i in range(64)],
        "lon double, lat double")
    out = mvt.mvt_point_tiles(pts, zoom=1).collect()
    assert out and all(r.zoom == 1 for r in out)
    total = 0
    for r in out:
        layers = mvt.decode_tile(bytes(r.mvt))
        assert layers[0]["name"] == "points"
        decoded = mvt.decode_points(layers[0])
        assert len(decoded) == r.n_features
        assert all(0 <= x < 4096 and 0 <= y < 4096 for x, y, _ in decoded)
        total += sum(p["n"] for _, _, p in decoded)
    assert total == 64  # every input point accounted for exactly once


def test_spark_sink_duplicate_pixels_collapse(spark):
    pts = spark.createDataFrame([(10.0, 20.0)] * 7, "lon double, lat double")
    out = mvt.mvt_point_tiles(pts, zoom=3).collect()
    assert len(out) == 1 and out[0].n_features == 1
    lay = mvt.decode_tile(bytes(out[0].mvt))[0]
    assert mvt.decode_points(lay)[0][2]["n"] == 7


def test_tilejson_document():
    from geotrellis_server_spark.styles.mvt import tilejson

    doc = tilejson("points", "https://example.com/{z}/{x}/{y}.mvt",
                   bounds=(-10.0, 40.0, 5.0, 55.0), minzoom=2, maxzoom=9)
    assert doc["tilejson"] == "3.0.0"
    assert doc["tiles"] == ["https://example.com/{z}/{x}/{y}.mvt"]
    assert doc["center"] == [-2.5, 47.5, 2]
    assert doc["vector_layers"] == [
        {"id": "points", "fields": {"n": "Number"},
         "minzoom": 2, "maxzoom": 9}]
    import json

    json.dumps(doc)  # serializable
    with pytest.raises(ValueError):
        tilejson("x", "u", minzoom=5, maxzoom=3)
