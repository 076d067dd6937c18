"""Cell-prefix partitioned layout: partition pruning evidence + result
equivalence with the unpartitioned path."""

import pyspark.sql.functions as F

from geotrellis_server_spark.sources import layout_tables as LT
from geotrellis_server_spark.sources import synth

WINDOW = (-80.0, 35.0, -70.0, 45.0)  # around the (-74, 40) hot cluster


def test_partition_pruning_and_equivalence(spark, tmp_path):
    path = str(tmp_path / "docs_part")
    docs = synth.extract_geometry(synth.docs(spark, 5000))
    LT.write_docs_partitioned(docs, path)

    full = spark.read.parquet(path)
    pruned = LT.read_docs_window(spark, path, WINDOW)
    n_full = LT.n_files_scanned(full)
    n_pruned = LT.n_files_scanned(pruned)
    assert n_pruned < n_full / 4  # window touches a small fraction of partitions

    # equivalence with the brute filter over everything
    exp = sorted(
        r.doc_id
        for r in docs.filter(
            (F.col("lon") >= WINDOW[0]) & (F.col("lon") <= WINDOW[2])
            & (F.col("lat") >= WINDOW[1]) & (F.col("lat") <= WINDOW[3])
        ).collect()
    )
    got = sorted(r.doc_id for r in pruned.collect())
    assert got == exp
    assert len(got) > 400  # the hot cluster sits inside the window


def test_partition_filter_in_plan(spark, tmp_path):
    path = str(tmp_path / "docs_part2")
    LT.write_docs_partitioned(synth.extract_geometry(synth.docs(spark, 1000)), path)
    pruned = LT.read_docs_window(spark, path, WINDOW)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_p" in plan


# --- Q3: explicit pushdown compiler (SearchFiltersQuery.scala:50-120) -------


def _docs_with_ts(spark, n=4000):
    d = synth.extract_geometry(synth.docs(spark, n))
    return d.withColumn(
        "ts",
        F.expr(
            "timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, "
            "CAST(CAST(substring(doc_id, 5) AS BIGINT) % 120 AS INT), 0, 0, 0)"
        ),
    )


def _composed_query():
    import datetime as dt

    from geotrellis_server_spark.query import ast as Qa

    utc = dt.timezone.utc
    return Qa.intersects((-80.0, 35.0, -70.0, 45.0)).and_(
        Qa.between(dt.datetime(2024, 2, 1, tzinfo=utc), dt.datetime(2024, 3, 10, tzinfo=utc))
    )


def test_scan_region_semigroups():
    import datetime as dt

    from geotrellis_server_spark.query import ast as Qa
    from geotrellis_server_spark.query.compile import compile_scan_region

    utc = dt.timezone.utc
    t = lambda m, d: dt.datetime(2024, m, d, tzinfo=utc)
    # And intersects both dims
    r = compile_scan_region(
        Qa.intersects((0, 0, 10, 10)).and_(Qa.intersects((5, 5, 20, 20)))
        .and_(Qa.between(t(1, 1), t(3, 1)).and_(Qa.between(t(2, 1), t(4, 1)))))
    assert r.bbox == (5, 5, 10, 10) and r.time == (t(2, 1), t(3, 1)) and not r.empty
    # disjoint And → empty (prune everything)
    assert compile_scan_region(
        Qa.intersects((0, 0, 1, 1)).and_(Qa.intersects((5, 5, 6, 6)))).empty
    assert compile_scan_region(
        Qa.between(t(1, 1), t(1, 5)).and_(Qa.between(t(2, 1), t(2, 5)))).empty
    # Or takes the hull on both dims
    r = compile_scan_region(
        Qa.intersects((0, 0, 1, 1)).and_(Qa.between(t(1, 1), t(1, 5)))
        .or_(Qa.intersects((5, 5, 6, 6)).and_(Qa.between(t(3, 1), t(3, 5)))))
    assert r.bbox == (0, 0, 6, 6) and r.time == (t(1, 1), t(3, 5))
    # Or with an unbounded side → unbounded dim
    r = compile_scan_region(Qa.intersects((0, 0, 1, 1)).or_(Qa.between(t(1, 1), t(1, 5))))
    assert r.bbox is None and r.time is None


def test_pushdown_prunes_both_dimensions(spark, tmp_path):
    path = str(tmp_path / "docs_2d")
    docs = _docs_with_ts(spark)
    LT.write_docs_partitioned(docs, path, time_col="ts")

    q = _composed_query()
    pruned = LT.read_docs_query(spark, path, q, time_col="ts")

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_p" in plan and "t_month" in plan

    n_full = LT.n_files_scanned(spark.read.parquet(path))
    n_pruned = LT.n_files_scanned(pruned)
    assert n_pruned < n_full / 4, (n_pruned, n_full)

    # result equivalence vs brute force on the unpartitioned frame
    from geotrellis_server_spark.query.compile import point_record_predicate

    exp = sorted(r.doc_id for r in docs.filter(point_record_predicate(q)).collect())
    got = sorted(r.doc_id for r in pruned.collect())
    assert got == exp and len(got) > 0


def test_pushdown_empty_region_scans_nothing(spark, tmp_path):
    path = str(tmp_path / "docs_empty")
    LT.write_docs_partitioned(_docs_with_ts(spark, 500), path, time_col="ts")
    import datetime as dt

    from geotrellis_server_spark.query import ast as Qa

    utc = dt.timezone.utc
    q = Qa.between(dt.datetime(2024, 1, 1, tzinfo=utc), dt.datetime(2024, 1, 5, tzinfo=utc)).and_(
        Qa.between(dt.datetime(2024, 6, 1, tzinfo=utc), dt.datetime(2024, 6, 5, tzinfo=utc)))
    assert LT.read_docs_query(spark, path, q, time_col="ts").count() == 0
