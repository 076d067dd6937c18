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
