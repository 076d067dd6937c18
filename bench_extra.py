"""Per-query isolation harness for optimization work (guide §1.4).

bench.py is FROZEN for measurement; this file exists so the optimizer
can time ONE query with a noop sink, dump its .explain("formatted")
plan to plans/r06/, and iterate without paying the full-suite prep.
Query DataFrame construction mirrors bench.py exactly (same inputs,
same parameters) — numbers cited in OPTIMIZATION_r06.md come from
here for isolation runs and from bench.py for suite runs.

Usage:
  python bench_extra.py --only q21 --runs 3            # time it
  python bench_extra.py --only q21 --explain before    # plans/r06/q21_before.txt
  python bench_extra.py --only q21,q26 --runs 2 --explain after
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen harness: reuse its materializers + constants
from bench import CACHE_DIR, CPUS, MULT, SF_DIR, _sf_of

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def build_queries(spark):
    """name -> zero-arg fn returning the DataFrame (mirrors bench.py)."""
    from pyspark.sql import functions as F

    from geotrellis_server_spark.operators import (dedup, knn as knn_op,
                                                   similarity, spatial_join,
                                                   text, tiling)
    from geotrellis_server_spark.sources import synth

    n_documents = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n = n_documents * MULT
    docs_path = bench.materialize_docs(spark, SF_DIR, n)

    def load():
        return synth.extract_geometry(spark.read.parquet(docs_path))

    zones = synth.zone_grid(spark)
    zone_cells = spatial_join.build_rect_zone_cells(zones)
    zone_cells.cache().count()
    spark.read.parquet(docs_path).write.mode("overwrite").format("noop").save()

    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def load_text():
        return spark.read.parquet(docs_path).select(
            "doc_id",
            F.expr("array_join(transform(filter(spans, s -> s.kind = "
                   "'text'), s -> s.text), ' ')").alias("text"))

    q = {}
    q["q1_pip_tile_pipeline"] = lambda: (
        tiling.assign_tiles(
            spatial_join.pip_join_rect(load(), zones, zone_cells=zone_cells),
            12)
        .groupBy("zone_id", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_docs")))
    q["q2_tile_counts_z8"] = lambda: tiling.tile_counts(load(), 8)
    from geotrellis_server_spark import sqlgen
    q["q3_cell_encode_r6"] = lambda: (
        load().selectExpr(f"{sqlgen.cell_key_sql('lon', 'lat', 6)} AS cell")
        .groupBy("cell").agg(F.count("*").alias("n")))
    q["q4_rasterize_z4"] = lambda: tiling.rasterize_count(load(), 4,
                                                          tile_size=64)
    q["q5_knn_k10"] = lambda: knn_op.knn_join(
        load(), [(0, -74.0, 40.5), (1, 10.0, 10.0), (2, 179.0, -80.0)], k=10)
    q["q6_dedup_minhash_lsh"] = lambda: dedup.minhash_dedup_pairs(
        documents, k=8, bands=1, rows_per_band=8, threshold=0.9)
    q["q7_cosine_topk100"] = lambda: similarity.cosine_topk(
        embeddings,
        [float(v) for v in embeddings.filter("vec_id = 0").first().embedding],
        100)
    q["q8_text_stats"] = lambda: text.text_stats(documents)
    q["q12_chunk_windows"] = lambda: text.chunk_documents(documents, size=50,
                                                          overlap=10)

    def _pretrain_curation():
        stats = text.text_stats(documents).select("doc_id", "quality_score",
                                                  "n_tokens")
        lang = text.lang_id(documents).select("doc_id", "lang_pred")
        surv = dedup.exact_dedup(documents).select(
            F.col("survivor_id").alias("doc_id"))
        splits = text.split_assign(documents)
        return (documents.select("doc_id").join(surv, "doc_id")
                .join(stats, "doc_id").filter("quality_score >= 0.3")
                .join(lang, "doc_id").join(splits, "doc_id")
                .groupBy("split", "lang_pred")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_tokens").alias("total_tokens")))

    q["q13_pretrain_curation"] = _pretrain_curation

    eval_docs = documents.where("doc_id % 100 = 0")
    train_docs = documents.where("doc_id % 100 != 0")
    q["q16_decontaminate"] = lambda: dedup.decontaminate(
        train_docs, eval_docs, n=5, min_hits=2)
    from geotrellis_server_spark.operators import sketch as sk
    q["q17_kmv_distinct"] = lambda: sk.kmv_estimate(
        documents.select("source", F.explode(F.split("text", " ")).alias("w")),
        "w", k=64, group_by=["source"])
    q["q20_span_dedup"] = lambda: text.repeated_span_dedup(load_text(), k=5)
    q["q21_lm_logprob"] = lambda: text.ngram_lm_logprob(
        load_text(), load_text().where("hash(doc_id) % 5 != 0"))

    from geotrellis_server_spark.operators import ml as ml_op

    def _q22():
        emb_path = bench.materialize_embeddings(spark, SF_DIR, 1_000_000, 64)
        emb_1m = spark.read.parquet(emb_path)
        return ml_op.kmeans(emb_1m, k=16, n_iter=2)

    q["q22_kmeans_1m"] = _q22

    def _q23():
        nb_docs = load_text().withColumn(
            "lang", F.expr("CAST(pmod(xxhash64(doc_id), 5) AS STRING)"))
        return ml_op.nb_classify(
            nb_docs.where("pmod(xxhash64(doc_id, 7), 2) = 0"),
            nb_docs, label_col="lang")

    q["q23_nb_classify"] = _q23

    from geotrellis_server_spark.operators import density as _dn
    q["q25_kernel_density"] = lambda: _dn.kernel_density(load(), 8, 64)

    from geotrellis_server_spark.operators.trajectory import rasterize_hops

    ev_mult = max(MULT // 20, 1)

    def _ev():
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        reps = spark.range(ev_mult).select(F.col("id").alias("rep"))
        eid = f"(event_id * {ev_mult} + rep)"
        return ev.crossJoin(reps).select(
            F.expr(eid).alias("event_id"),
            (F.col("user_id") * ev_mult + F.col("rep")).alias("user_id"),
            "ts",
            F.expr(sqlgen.lon_sql(eid)).alias("lon"),
            F.expr(sqlgen.lat_sql(eid)).alias("lat"))

    q["q26_hops_rasterize"] = lambda: rasterize_hops(_ev(), zoom=2,
                                                     tile_size=64)

    # q9/q11/q14 share the cached z6 pyramid (built lazily on demand)
    from geotrellis_server_spark.maml import ast as M
    from geotrellis_server_spark.maml.eval import eval_expr

    _tiles = {}

    def tiles_z6():
        if "t" not in _tiles:
            t = (tiling.rasterize_count(load(), 6, tile_size=64)
                 .repartition(int(CPUS), "zoom", "tile_x", "tile_y").cache())
            t.count()
            _tiles["t"] = t
        return _tiles["t"]

    q["q14_pyramid_up_z6to5"] = lambda: tiling.pyramid_up(tiles_z6(),
                                                          agg="sum")
    q["q9_focal_fmean_z6"] = lambda: eval_expr(
        M.focal("fmean", M.var("d"), radius=1), {"d": tiles_z6()})
    mask_ring = [(-60.3, -20.7), (45.9, -33.1), (70.4, 38.6), (-85.2, 55.9)]
    q["q11_mask_polygon_z6"] = lambda: eval_expr(
        M.mask(M.var("d"), M.geom(mask_ring)), {"d": tiles_z6()})

    bulk_q = spark.range(1000).selectExpr(
        "id AS query_id",
        "CAST((id * 7349) % 368640 AS DOUBLE) / 1024.0 - 180.0 AS qlon",
        "CAST((id * 4391) % 174080 AS DOUBLE) / 1024.0 - 85.0 AS qlat")
    q["q10_knn_bulk_1k"] = lambda: knn_op.knn_join_bulk(
        load(), bulk_q, k=10, res=knn_op.auto_res(n))
    return q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", required=True, help="comma-separated qN names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="suffix: write plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--cores", type=int, default=CPUS)
    args = ap.parse_args()

    from geotrellis_server_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores * 4,
                      extra_conf={"spark.sql.warehouse.dir":
                                  f"file:{bench.WAREHOUSE}"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = build_queries(spark)
    want = {t for t in args.only.split(",") if t}
    names = [nm for nm in qs
             if nm in want or nm.split("_")[0] in want]
    out = {}
    for nm in names:
        fn = qs[nm]
        if args.explain:
            os.makedirs(PLANS_DIR, exist_ok=True)
            mode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            plan = fn()._jdf.queryExecution().explainString(mode)
            with open(os.path.join(PLANS_DIR,
                                   f"{nm}_{args.explain}.txt"), "w") as f:
                f.write(plan)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{nm} run{i}")
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[nm] = times
        print(nm, times, "min", min(times), flush=True)
    print({"load_1m": round(os.getloadavg()[0], 2), "times": out})


if __name__ == "__main__":
    main()
