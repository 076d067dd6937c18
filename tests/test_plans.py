"""Physical-plan audits: the properties that make the engine scale must
be visible in the executed plan, not just implied — filter pushdown to
the parquet scan, column pruning in ReadSchema, broadcast joins on the
flagship path (no sort-merge), and whole-stage codegen around the tile
math. A regression in any of these silently costs 10-100x at 100 TB."""

import pyspark.sql.functions as F

from geotrellis_server_spark.operators import spatial_join, tiling
from geotrellis_server_spark.sources import synth

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.filter("ts >= timestamp '2024-01-10 00:00:00'").select("event_id")
    plan = _plan(q)
    assert "PushedFilters" in plan and "ts" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_in_read_schema(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.filter("ts >= timestamp '2024-01-10 00:00:00'").select("event_id")
    read_schema = _plan(q).split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "ts" in read_schema
    # untouched columns must NOT be scanned
    assert "user_id" not in read_schema and "lon" not in read_schema


def test_flagship_broadcasts_and_never_sort_merges(spark):
    d = synth.extract_geometry(synth.docs(spark, 1000))
    joined = spatial_join.pip_join_rect(d, synth.zone_grid(spark))
    out = tiling.assign_tiles(joined, 8).groupBy("zone_id", "tile_x", "tile_y").agg(
        F.count("*").alias("n")
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tile_math_in_wholestage_codegen(spark):
    d = synth.extract_geometry(synth.docs(spark, 1000))
    df = tiling.tile_counts(d, 8)
    df.collect()  # AQE: codegen stages appear in the FINAL plan only
    plan = _plan(df)
    # '*(n)' prefixes = whole-stage-codegen stage ids in the final plan
    assert "*(" in plan and "isFinalPlan=true" in plan
    # the hot path has no Python evaluation nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partial_aggregation_before_exchange(spark):
    # map-side combine: a HashAggregate must appear BELOW the exchange
    # (partial) and above it (final) — hot keys collapse before shuffling
    d = synth.extract_geometry(synth.docs(spark, 1000))
    plan = _plan(tiling.tile_counts(d, 8))
    ex = plan.index("Exchange")
    assert "HashAggregate" in plan[:ex], "no map-side partial aggregate"
    assert "HashAggregate" in plan[ex:], "no final aggregate"


def test_cosine_topk_is_take_ordered_not_global_sort(spark):
    # Round-2 verdict item 1: top-k must plan as TakeOrderedAndProject
    # (per-partition top-k + driver merge of k*P rows), NOT a global
    # Window.orderBy that funnels the whole corpus into one task. The
    # only single-partition exchange allowed is the rank window over the
    # <=k-row result ABOVE the TakeOrderedAndProject.
    from geotrellis_server_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(v) for v in emb.filter("vec_id = 0").first().embedding]
    for df in (
        S.cosine_topk(emb, qvec, 5),
        S.lsh_ann_topk(emb, qvec, 5, n_planes=4),
    ):
        plan = _plan(df)
        tk = plan.index("TakeOrderedAndProject")
        # below the take-ordered (the corpus side): no single-partition
        # exchange and no global sort of the scan
        below = plan[tk:]
        assert "Exchange SinglePartition" not in below
        assert "Sort [" not in below


def test_ivf_topk_is_take_ordered(spark):
    from geotrellis_server_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(v) for v in emb.filter("vec_id = 0").first().embedding]
    cent = S.ivf_train(emb, n_centroids=4, seed=7)
    plan = _plan(S.ivf_ann_topk(emb, cent, qvec, 5, nprobe=4))
    tk = plan.index("TakeOrderedAndProject")
    assert "Exchange SinglePartition" not in plan[tk:]


def test_focal_halo_reuses_input_partitioning(spark):
    """The strips-only halo exchange must NOT reshuffle the tile bodies
    when the input is already hash-partitioned by the halo key: exactly
    one Exchange (the strip rows) on the body side of the join."""
    from geotrellis_server_spark.operators import tiling
    from geotrellis_server_spark.operators.focal import with_halo
    from geotrellis_server_spark.sources import synth

    d = synth.extract_geometry(synth.docs(spark, 2000))
    tiles = (
        tiling.rasterize_count(d, 3, tile_size=8)
        .repartition(8, "zoom", "tile_x", "tile_y")
        .cache()
    )
    tiles.count()
    plan = with_halo(tiles, 1)._jdf.queryExecution().executedPlan().toString()
    # the join's BODY side must be the cached scan DIRECTLY — no Exchange
    # between the join and InMemoryTableScan (plan.count of exchanges is
    # useless here: the InMemoryRelation description embeds the cached
    # lineage's unexecuted exchanges)
    import re

    assert re.search(
        r"Join [^\n]*\n\s*:- InMemoryTableScan", plan
    ), plan[:4000]
    tiles.unpersist()


def test_kmeans_assignment_is_shuffle_free(spark):
    """The final k-means assignment pass must be scan -> Arrow kernel
    with NO Exchange: centroids ride inside the kernel closure."""
    from geotrellis_server_spark.operators.ml import kmeans

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(kmeans(emb, k=4, n_iter=0))
    assert "Exchange" not in plan
    assert "MapInArrow" in plan


def test_nb_scoring_broadcasts_the_model(spark):
    """NB classification joins the vocab-sized model BROADCAST onto the
    token stream — a sort-merge join here would shuffle the corpus."""
    from geotrellis_server_spark.operators.ml import nb_classify

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(nb_classify(docs.where("doc_id % 2 = 0"), docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_od_flows_single_user_exchange_then_partial_agg(spark):
    """OD flows: one exchange keyed by user for the lag window, then a
    hash aggregate WITH a partial (map-side) phase before the flow-key
    exchange — the hot-pair absorber."""
    from geotrellis_server_spark.operators.trajectory import od_flows

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts",
        F.expr("CAST(event_id % 360 AS DOUBLE) - 180.0").alias("lon"),
        F.expr("CAST(event_id % 170 AS DOUBLE) - 85.0").alias("lat"))
    plan = _plan(od_flows(ev, res=4))
    # partial_count before the final agg = map-side combine present
    assert "partial_count" in plan or "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 2  # user + flow key
