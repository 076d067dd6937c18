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
