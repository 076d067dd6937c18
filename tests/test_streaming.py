"""Incremental tiling stream: two micro-batch waves must converge to the
same counts as a batch run over the full input."""

import pyspark.sql.functions as F

from geotrellis_server_spark.operators import tiling
from geotrellis_server_spark.sources import synth
from geotrellis_server_spark.streaming.incremental import (
    incremental_tile_counts,
    serve_tile_counts,
)


def test_incremental_equals_batch(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "tiles")
    ck = str(tmp_path / "ck")

    # wave 1: docs 0..999
    synth.docs(spark, 1000).write.mode("append").parquet(docs_dir)
    q = incremental_tile_counts(spark, docs_dir, out_dir, zoom=6, checkpoint_dir=ck)
    q.awaitTermination()

    # wave 2: docs arrive later (distinct ids via a shifted range)
    synth.docs(spark, 1500).filter("doc_id >= 'doc-000000001000'").write.mode("append").parquet(
        docs_dir
    )
    q2 = incremental_tile_counts(spark, docs_dir, out_dir, zoom=6, checkpoint_dir=ck)
    q2.awaitTermination()

    served = {
        (r.tile_x, r.tile_y): r.n_docs for r in serve_tile_counts(spark, out_dir).collect()
    }
    batch = {
        (r.tile_x, r.tile_y): r.n_docs
        for r in tiling.tile_counts(synth.extract_geometry(synth.docs(spark, 1500)), 6).collect()
    }
    assert served == batch
    assert sum(served.values()) == 1500


# --- watermarked windows + applyInPandasWithState (streaming/windowed.py) ---


def _write_events(spark, path, rows, mode="append"):
    import datetime as dt

    from geotrellis_server_spark.streaming.windowed import EVENTS_SCHEMA

    data = [(i, lon, lat, dt.datetime(2024, 1, 1, h, m)) for i, lon, lat, h, m in rows]
    spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.mode(mode).parquet(path)


def _run_windowed(spark, src, out, ckpt):
    from geotrellis_server_spark.streaming.windowed import (
        EVENTS_SCHEMA, windowed_tile_counts)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = windowed_tile_counts(stream, zoom=2, window="10 minutes", watermark="5 minutes")
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: three events in [10:00, 10:10) at one location, plus a
    # sentinel much later that advances the watermark past that window
    _write_events(spark, src, [
        (1, 10.0, 10.0, 10, 1), (2, 10.0, 10.0, 10, 5), (3, 10.0, 10.0, 10, 9),
        (4, 10.0, 10.0, 11, 0),
    ])
    _run_windowed(spark, src, out, ckpt)
    got = spark.read.parquet(out).collect()
    w1 = [r for r in got if r.window.start.minute == 0 and r.window.start.hour == 10]
    assert len(w1) == 1 and w1[0].n_events == 3  # window closed and emitted once

    # wave 2: a LATE event for the closed window (behind the watermark)
    # plus a fresh sentinel — the late event must be dropped
    _write_events(spark, src, [
        (5, 10.0, 10.0, 10, 2),   # late for [10:00, 10:10)
        (6, 10.0, 10.0, 12, 0),
    ])
    _run_windowed(spark, src, out, ckpt)
    got2 = spark.read.parquet(out).collect()
    w1b = [r for r in got2 if r.window.start.minute == 0 and r.window.start.hour == 10]
    assert len(w1b) == 1 and w1b[0].n_events == 3  # unchanged: late row dropped


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    from geotrellis_server_spark.streaming.windowed import (
        EVENTS_SCHEMA, stateful_tile_totals)

    src = str(tmp_path / "events2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    def run():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

        def sink(batch_df, batch_id):  # update-mode rows → per-batch files
            batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

        q = (
            stateful_tile_totals(stream, zoom=2)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_events(spark, src, [(1, 10.0, 10.0, 9, 0), (2, 10.0, 10.0, 9, 1),
                               (3, -74.0, 40.0, 9, 2)])
    run()
    # second wave: state must RESUME from the checkpoint (cumulative)
    _write_events(spark, src, [(4, 10.0, 10.0, 9, 3)])
    run()
    rows = spark.read.parquet(out).collect()
    from geotrellis_server_spark.grids.layout import tile_key_np
    import numpy as np

    tx, ty = tile_key_np(np.array([10.0]), np.array([10.0]), 2)
    mine = sorted((r.total for r in rows
                   if r.tile_x == int(tx[0]) and r.tile_y == int(ty[0])))
    assert mine == [2, 3]  # batch 1 emitted 2, batch 2 emitted cumulative 3


# --- streaming ingest dedup (streaming/dedup_stream.py) ---------------------


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from geotrellis_server_spark.streaming.dedup_stream import (
        DOCS_SCHEMA, run_dedup_wave)

    src = str(tmp_path / "docs")
    out = str(tmp_path / "kept")
    ck = str(tmp_path / "ck")

    # wave 1: two distinct texts, one duplicated in-batch (min id wins)
    w1 = [(3, "alpha beta"), (1, "alpha beta"), (2, "gamma")]
    spark.createDataFrame(w1, DOCS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run_dedup_wave(spark, src, out, ck).awaitTermination()

    # wave 2: a cross-batch duplicate (must be dropped) + a new text
    w2 = [(10, "alpha beta"), (11, "delta")]
    spark.createDataFrame(w2, DOCS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run_dedup_wave(spark, src, out, ck).awaitTermination()

    kept = {(r.content_hash, r.doc_id) for r in spark.read.parquet(out).collect()}
    by_id = sorted(d for _, d in kept)
    assert by_id == [1, 2, 11]  # in-batch min; cross-batch dup dropped
    assert len({h for h, _ in kept}) == 3


def test_streaming_lsh_ingest_equals_batch(spark, tmp_path):
    """Drain a 3-file source one file per micro-batch; accumulated
    near-dup pairs must equal the one-shot batch minhash_dedup_pairs
    over the full corpus (incremental maintenance changes WHEN pairs
    are found, never WHICH)."""
    from geotrellis_server_spark.operators.dedup import minhash_dedup_pairs
    from geotrellis_server_spark.streaming.lsh_ingest import (
        read_pairs,
        start_lsh_ingest,
    )

    src = str(tmp_path / "src")
    # 60 docs in 3 waves; texts collide across waves (i % 20) so
    # near-dup pairs span micro-batch boundaries
    def wave(lo, hi, path):
        spark.range(lo, hi).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(0, 11 + CAST(id % 3 AS INT)),"
            " j -> concat('w', CAST((id % 20) * 7 + j AS STRING)))) AS text",
        ).coalesce(1).write.mode("append").parquet(path)

    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        wave(lo, hi, src)

    q = start_lsh_ingest(
        spark, src, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ck"), threshold=0.5, max_files_per_trigger=1,
    )
    q.awaitTermination()

    got = {(r.a, r.b) for r in read_pairs(spark, str(tmp_path / "pairs")).collect()}
    docs = spark.read.parquet(src)
    want = {(r.a, r.b) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert got == want and len(want) > 0


def test_streaming_lsh_ingest_restart_no_duplicates(spark, tmp_path):
    """A second AvailableNow run over an already-drained source must be a
    no-op (checkpoint replay), and late files found by the restart are
    matched against the persisted index."""
    from geotrellis_server_spark.streaming.lsh_ingest import (
        read_pairs,
        start_lsh_ingest,
    )

    src = str(tmp_path / "src")
    spark.range(0, 10).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(0, 11),"
        " j -> concat('w', CAST((id % 5) * 7 + j AS STRING)))) AS text",
    ).coalesce(1).write.mode("append").parquet(src)
    args = (spark, src, str(tmp_path / "idx"), str(tmp_path / "pairs"),
            str(tmp_path / "ck"))
    start_lsh_ingest(*args).awaitTermination()
    n1 = read_pairs(spark, str(tmp_path / "pairs")).count()
    # restart with no new files: nothing new
    start_lsh_ingest(*args).awaitTermination()
    assert read_pairs(spark, str(tmp_path / "pairs")).count() == n1
    # a late file with a text colliding with the corpus -> new cross pairs
    spark.createDataFrame(
        [(100, None)], "doc_id BIGINT, _x STRING"
    ).selectExpr(
        "doc_id",
        "concat_ws(' ', transform(sequence(0, 11),"
        " j -> concat('w', CAST(0 * 7 + j AS STRING)))) AS text",
    ).coalesce(1).write.mode("append").parquet(src)
    start_lsh_ingest(*args).awaitTermination()
    pairs = {(r.a, r.b) for r in read_pairs(spark, str(tmp_path / "pairs")).collect()}
    # doc 100 duplicates the text of docs 0 and 5 (id % 5 == 0)
    assert (0, 100) in pairs and (5, 100) in pairs


def test_streaming_ivf_ingest_probe_equals_batch(spark, tmp_path):
    """Two embedding waves drained one file per batch: probing the
    ingested partitioned index must equal the batch IVF probe over the
    union, and the probe must prune ivf_cell partitions."""
    from geotrellis_server_spark.operators import similarity as S
    from geotrellis_server_spark.streaming.ann_ingest import (
        probe_topk,
        start_ivf_ingest,
    )

    src = str(tmp_path / "emb")

    def wave(lo, hi):
        spark.range(lo, hi).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 15), j -> CAST("
            " sin(CAST(id % 16 AS DOUBLE) * 2.7 + CAST(j AS DOUBLE))"
            " + 0.05 * sin(CAST(id AS DOUBLE) * 0.913 + CAST(j AS DOUBLE) * 1.71)"
            " AS FLOAT)) AS embedding",
        ).coalesce(1).write.mode("append").parquet(src)

    wave(0, 400)
    wave(400, 800)
    full = spark.read.parquet(src)
    cent = S.ivf_train(full, n_centroids=16, seed=7)

    q = start_ivf_ingest(
        spark, src, str(tmp_path / "idx"), str(tmp_path / "ck"), cent,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    qvec = [float(v) for v in full.where("vec_id = 37").first().embedding]
    got = [r.vec_id for r in
           probe_topk(spark, str(tmp_path / "idx"), cent, qvec, 10, nprobe=4).collect()]
    want = [r.vec_id for r in
            S.ivf_ann_topk(S.ivf_assign(full, cent), cent, qvec, 10, nprobe=4).collect()]
    assert got == want
    plan = probe_topk(spark, str(tmp_path / "idx"), cent, qvec, 10, nprobe=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:200]


def test_streaming_tile_ingest_equals_batch_rasterize(spark, tmp_path):
    """Per-pixel raster ingest: two waves of points -> serving view
    row-for-row identical to rasterize_count over the full history;
    compaction preserves it."""
    import numpy as np

    from geotrellis_server_spark.streaming import tile_ingest as TI

    src = str(tmp_path / "pts")
    deltas = str(tmp_path / "deltas")
    ck = str(tmp_path / "ck2")

    def pts(n, lo):
        return synth.extract_geometry(synth.docs(spark, n)).select(
            "doc_id", "lon", "lat"
        ).filter(f"doc_id >= 'doc-{lo:012d}'")

    pts(800, 0).write.mode("append").parquet(src)
    TI.start_tile_ingest(spark, src, deltas, ck, zoom=4,
                         tile_size=16).awaitTermination()
    pts(1200, 800).write.mode("append").parquet(src)
    TI.start_tile_ingest(spark, src, deltas, ck, zoom=4,
                         tile_size=16).awaitTermination()

    want = {
        (r.tile_x, r.tile_y): r.cells
        for r in tiling.rasterize_count(
            synth.extract_geometry(synth.docs(spark, 1200)), 4, tile_size=16
        ).collect()
    }
    got = {(r.tile_x, r.tile_y): r.cells
           for r in TI.read_tiles(spark, deltas, 4, tile_size=16).collect()}
    assert want.keys() == got.keys() and len(want) > 10
    for k in want:
        assert want[k] == got[k]

    # offline compaction: plain scan serves the same rows
    compacted = str(tmp_path / "compacted")
    TI.compact_tile_deltas(spark, deltas, compacted, 4, tile_size=16)
    comp = {(r.tile_x, r.tile_y): r.cells
            for r in spark.read.parquet(compacted).collect()}
    assert comp == got


def test_streaming_tile_ingest_two_zooms_share_dir(spark, tmp_path):
    """Two ingest streams (own checkpoints, both batch 0) sharing one
    delta_dir must not clobber each other (zoom-scoped batch subtrees)."""
    from geotrellis_server_spark.streaming import tile_ingest as TI

    src = str(tmp_path / "pts")
    deltas = str(tmp_path / "deltas")
    synth.extract_geometry(synth.docs(spark, 600)).select(
        "doc_id", "lon", "lat").write.mode("append").parquet(src)
    TI.start_tile_ingest(spark, src, deltas, str(tmp_path / "ck3"),
                         zoom=3, tile_size=8).awaitTermination()
    TI.start_tile_ingest(spark, src, deltas, str(tmp_path / "ck4"),
                         zoom=4, tile_size=8).awaitTermination()
    n3 = TI.read_tile_counts(spark, deltas, 3).count()
    n4 = TI.read_tile_counts(spark, deltas, 4).count()
    assert n3 > 0 and n4 > 0  # the second stream did not wipe the first


# --- event-time sessionization: session_window + custom pending-state ---


def _write_user_events(spark, path, rows):
    """rows: (user_id, hour, minute) on 2024-01-01"""
    import datetime as dt

    data = [(int(u), dt.datetime(2024, 1, 1, h, m)) for u, h, m in rows]
    spark.createDataFrame(data, "user_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(path)


def _run_sessions(spark, fn, src, out, ckpt):
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        fn(stream, gap_minutes=60)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_sessions(spark, src):
    from geotrellis_server_spark.operators.asof import sessionize

    ev = spark.read.parquet(src)
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev, ["user_id"], "ts", 3600.0)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"))
        .drop("session_id").collect()
    }


import pytest


@pytest.mark.parametrize("variant", ["session_window", "custom_state"])
def test_streaming_sessionize_equals_batch(spark, tmp_path, variant):
    from geotrellis_server_spark.streaming.windowed import (
        streaming_session_counts, streaming_sessionize)

    fn = (streaming_session_counts if variant == "session_window"
          else streaming_sessionize)
    src = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: user 1 session A (10:00, 10:10); user 2 lone event 10:05.
    # max ts 10:10 → watermark after the wave is 9:10, nothing closes.
    _write_user_events(spark, src, [(1, 10, 0), (1, 10, 10), (2, 10, 5)])
    _run_sessions(spark, fn, src, out, ckpt)

    # wave 2: user 1 continues session A at 10:30 (after the 9:10
    # watermark, so it must MERGE, not drop); user 3 has a within-batch
    # gap split (12:00 vs 15:00 — two sessions in one batch). Final
    # watermark 15:00-60m = 14:00 closes everything ending before 13:00.
    _write_user_events(spark, src, [(1, 10, 30), (3, 12, 0), (3, 15, 0)])
    _run_sessions(spark, fn, src, out, ckpt)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    batch = _batch_sessions(spark, src)
    # streaming emits exactly the batch sessions the final watermark has
    # closed — user 3's 15:00 session stays open and unemitted
    import datetime as dt

    wm = dt.datetime(2024, 1, 1, 14, 0)
    expected = {s for s in batch
                if s[2] + dt.timedelta(minutes=60) <= wm}
    assert got == expected
    assert len(expected) == 3  # the scenario actually exercises closure
    # the within-batch gap split happened: only user 3's FIRST session
    # emitted, as its own session
    assert [s for s in got if s[0] == 3] == [
        (3, dt.datetime(2024, 1, 1, 12, 0), dt.datetime(2024, 1, 1, 12, 0), 1)]
    # the cross-batch continuation merged: user 1's session spans waves
    assert [s for s in got if s[0] == 1] == [
        (1, dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 10, 30), 3)]


# --- streaming OD flows: watermark-exact trajectory pairs -------------------


def _write_od_events(spark, path, rows):
    """rows: (event_id, user_id, hour, minute, lon, lat)"""
    import datetime as dt

    from geotrellis_server_spark import sqlgen

    data = [(int(e), int(u), dt.datetime(2024, 1, 1, h, m),
             float(lo), float(la)) for e, u, h, m, lo, la in rows]
    (spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
     .withColumn("cell", F.expr(sqlgen.cell_key_sql("lon", "lat", 4)))
     .drop("lon", "lat")
     .coalesce(1).write.mode("append").parquet(path))


def test_streaming_od_flows_equals_batch(spark, tmp_path):
    from geotrellis_server_spark.operators.trajectory import od_flows
    from geotrellis_server_spark.streaming.windowed import streaming_od_flows

    src, out, ckpt = (str(tmp_path / p) for p in ("ev", "out", "ckpt"))
    # wave 1 arrives OUT OF ORDER within the hour lateness window
    real = [
        (1, 1, 10, 0, 0.0, 0.0),
        (3, 1, 10, 20, 40.0, 20.0),   # id 3 arrives before id 2
        (2, 1, 10, 10, 120.0, 40.0),
        (4, 2, 10, 5, -120.0, -40.0),
        (5, 2, 10, 6, -120.0, -40.0),
    ]
    _write_od_events(spark, src, real)
    # wave 2: far-future flusher per user pushes the watermark past
    # every real event (the flushers themselves stay pending)
    _write_od_events(spark, src, [(90, 1, 23, 0, 0.0, 0.0),
                                  (91, 2, 23, 0, 0.0, 0.0)])

    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, cell long"
    ).parquet(src)
    q = (streaming_od_flows(stream, lateness_minutes=60)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r.src_cell, r.dst_cell): r.n for r in
           spark.read.parquet(out).groupBy("src_cell", "dst_cell")
           .agg(F.count("*").alias("n")).collect()}

    import datetime as dt
    ev = spark.createDataFrame(
        [(int(e), int(u), dt.datetime(2024, 1, 1, h, m), float(lo),
          float(la)) for e, u, h, m, lo, la in real],
        "event_id long, user_id long, ts timestamp, lon double, "
        "lat double")
    want = {(r.src_cell, r.dst_cell): r.n_trips
            for r in od_flows(ev, res=4).collect()}
    assert got == want and got  # out-of-order id2/id3 ordered by TS
