"""geotrellis_server_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of geotrellis/geotrellis-server's query and
data-processing capabilities (OGC GetMap/GetTile/GetCoverage semantics,
catalog query algebra, MAML map algebra, mosaic/merge, histograms, styles)
as idiomatic Spark DataFrame pipelines over tables of interleaved
text+media documents, per SURVEY.md.

Design principles (SURVEY.md §4, §7):
- Declarative plans: tile/cell math is pure Spark SQL arithmetic (stays in
  whole-stage codegen); Python only in Arrow-vectorized pandas UDFs.
- One canonical geometry CRS (EPSG:4326); WebMercator only for tile math.
- Broadcast small sides, salt hot cells, AQE on, partition by cell prefix.
"""

__version__ = "0.1.0"
