import pytest
from pyspark.sql import functions as F

from geotrellis_server_spark.sources.zorder import (
    write_zordered, zorder_key_expr)


def _ref_morton(x, y):
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 2, 255, 40000) for y in (0, 3, 7, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", F.expr(zorder_key_expr("x", "y"))
                    .alias("z")).collect()
    for r in got:
        assert r.z == _ref_morton(int(r.x) & 65535, int(r.y) & 65535)


def test_zordered_layout_prunes_files(spark, tmp_path):
    # 64x64 grid of tiles, one row each; quarter-extent bbox should
    # touch ~1/4 of the z-ordered files but ALL of a row-major layout's
    n = 64
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "tile_x long, tile_y long, v long")
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, n_files=16)

    def files_hit(path):
        q = (spark.read.parquet(path)
             .where("tile_x < 32 AND tile_y < 32")
             .select(F.input_file_name().alias("f")).distinct())
        return q.count()

    hit = files_hit(zpath)
    assert hit <= 6, hit   # quarter bbox -> ~4 of 16 z-files
    # control: single-axis (y-sorted) layout prunes only the y half of
    # the predicate -> exactly half the files; z-order prunes BOTH axes
    rpath = str(tmp_path / "r")
    (df.repartitionByRange(16, "tile_y").sortWithinPartitions("tile_y")
       .write.mode("overwrite").parquet(rpath))
    control = files_hit(rpath)
    assert control == 8 and hit < control
