"""Iterative graph analytics over edge DataFrames — PageRank with
integer-quantized mass passing.

Reference parity note: the reference engine (geotrellis-server) has no
graph operators; this belongs to the LLM-pipeline family the brief adds
(link-graph quality signals for web corpora — PageRank/harmonic
centrality over the crawl graph is the classic document-prior,
cf. Page et al. 1999 and Common Crawl's host-level ranks).

Determinism design: floating-point PageRank is order-sensitive (per-
vertex sums of double contributions), so cross-engine exactness is
impossible. Instead every rank is an INTEGER number of 2⁻²⁰ mass
quanta: contributions are computed with integer floor-division
(pr DIV out_degree) and summed as BIGINTs — associative and
commutative, so ANY partitioning/order yields the identical result and
a SQL oracle can replay it bit-for-bit. The mass lost to floor-division
(< out_degree quanta per vertex per round) stays lost in both engines
identically; with S = 2²⁰ quanta the relative rank error is < 1e-5 —
noise compared to the damping model itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 20  # rank mass quanta per unit


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint=None,
) -> DataFrame:
    """PageRank over a directed edge list: (node, rank_q) after
    ``n_iter`` synchronous rounds, rank_q in 2⁻²⁰ quanta (divide by
    2²⁰·N for the usual 1/N-normalized rank). Damping is the rational
    damping_num/damping_den (default 0.85) applied in integer
    arithmetic. Dangling nodes (no out-edges) leak their mass — the
    standard simplification; Σ rank therefore shrinks unless the graph
    is closed.

    Update rule, all BIGINT:
        contrib(u→v) = pr[u] DIV out_deg(u)
        pr'[v] = (1−d)·S DIV 1 + d · Σ contrib  (rational d, floor)

    ``checkpoint`` (lineage.IterativeCheckpoint): each round's rank
    table commits as a parquet snapshot; a re-run resumes at the first
    uncommitted round and — the iteration being exact-integer — lands
    on the bit-identical result (north-rule resumability).

    Scale shape per round: one equi-join of the rank table onto the
    edge list (both sides partitioned by the join key; AQE broadcasts
    the rank table when it fits) and one groupBy(dst) BIGINT sum with
    map-side partials. Lineage is cut with localCheckpoint each round —
    10 rounds stay 10 jobs, not a 10-deep recompute tree. O(log d)
    alternatives (pointer jumping) don't apply: PageRank is inherently
    per-round synchronous."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("deg"))
    # keep (node, deg) resident: reused every round
    base = nodes.join(deg, "node", "left").localCheckpoint(eager=True)
    teleport = SCALE * (damping_den - damping_num) // damping_den
    pr = base.select("node", F.lit(int(SCALE)).cast("long").alias("pr_q"))
    e = edges.select(F.col(src_col).alias("node"),
                     F.col(dst_col).alias("dst"))
    start = 0
    if checkpoint is not None:
        # manifest round i = rank table AFTER iteration i (0-based)
        start = min(checkpoint.resume_round(), n_iter)
        if start >= 1:
            pr = checkpoint.load_df(start - 1)
    for _it in range(start, n_iter):
        contrib = (
            pr.join(base.where("deg IS NOT NULL").select("node", "deg"),
                    "node")
            .join(e, "node")
            .select(F.col("dst").alias("node"),
                    F.expr("pr_q DIV deg").alias("c"))
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (
            base.select("node")
            .join(summed, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({teleport} + {damping_num} * coalesce(s, 0) "
                    f"DIV {damping_den} AS BIGINT)").alias("pr_q"))
            .localCheckpoint(eager=True)
        )
        if checkpoint is not None:
            checkpoint.commit_df(_it, pr)
    return pr.select("node", F.col("pr_q").cast("long").alias("rank_q"))


def label_propagation(
    edges: DataFrame,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — the
    classic community detector for host/link graphs: every node starts
    labeled with its own id; each round it adopts the most frequent
    label among its neighbors (undirected — edges are symmetrized),
    ties broken by the SMALLEST label. All state is integer node ids
    and counts, so every round — and therefore the final labeling — is
    exactly reproducible in any engine at any partitioning.

    Returns (node, label) after ``n_iter`` rounds.

    Scale shape per round: one equi-join of the label table onto the
    symmetrized edge list (AQE broadcasts the label side when it fits)
    and two map-side-combined aggregations — counts keyed by
    (node, label), then the argmax as min(struct(-count, label)) keyed
    by node: a pure aggregation argmax, NO per-node window/sort.
    localCheckpoint cuts lineage each round (flat, like pagerank).
    Synchronous LPA can 2-cycle on bipartite structure; determinism is
    what the contract guarantees, convergence is the caller's call."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    und = (edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b"))
           .unionByName(edges.select(F.col(dst_col).alias("a"),
                                     F.col(src_col).alias("b")))
           .distinct().localCheckpoint(eager=True))
    lab = und.select(F.col("a").alias("node")).distinct() \
             .select("node", F.col("node").alias("label"))
    for _ in range(n_iter):
        cnt = (und.join(lab.withColumnRenamed("node", "b"), "b")
               .groupBy(F.col("a").alias("node"), "label")
               .agg(F.count("*").alias("c")))
        lab = (cnt.groupBy("node")
               .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                   F.col("label").alias("l"))).alias("m"))
               .select("node", F.col("m.l").alias("label"))
               .localCheckpoint(eager=True))
    return lab.select("node", F.col("label").cast("long").alias("label"))


def kcore(
    edges: DataFrame,
    k: int = 3,
    n_rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling over the undirected graph: ``n_rounds``
    synchronous rounds each removing every node whose CURRENT degree is
    < k (Matula & Beck 1983 peeling, synchronized). Returns the nodes
    still standing with their residual degree: (node, degree). With
    enough rounds this IS the k-core; the round count is part of the
    operator's definition so the result is deterministic and an
    unrolled SQL oracle can replay it (convergence typically takes a
    handful of rounds — each round removes whole shells).

    Scale shape per round: one map-side-combined degree count + one
    semi-join of the edge list against the surviving nodes (both sides
    keyed by node; AQE broadcasts the survivor side when small).
    localCheckpoint keeps lineage flat."""
    if k < 1 or n_rounds < 0:
        raise ValueError("k >= 1 and n_rounds >= 0 required")
    und = (edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b"))
           .unionByName(edges.select(F.col(dst_col).alias("a"),
                                     F.col(src_col).alias("b")))
           .distinct().localCheckpoint(eager=True))
    live = und
    for _ in range(n_rounds):
        deg = live.groupBy("a").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= int(k)).select("a")
        live = (live.join(keep, "a")
                .join(keep.withColumnRenamed("a", "b"), "b")
                .select("a", "b").localCheckpoint(eager=True))
    return (live.groupBy(F.col("a").alias("node"))
            .agg(F.count("*").cast("long").alias("degree")))


def connected_components(
    edges: DataFrame,
    n_iter: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous hash-min connected components: every node starts
    labeled with its own id; each round it takes the min of its label
    and its neighbors' labels. After ``n_iter`` rounds each node holds
    the min node-id within ``n_iter`` hops — the exact component id once
    n_iter ≥ the graph diameter, and a deterministic engine-reproducible
    object at any round count (the round count is part of the contract,
    like kcore/pagerank). Monotone integer state → partition-invariant.

    Returns (node, component).

    Scale shape per round: ONE equi-join of the label table onto the
    symmetrized edge list + a map-side-combined min keyed by node —
    min is a set function, so hot nodes collapse in partials.
    localCheckpoint keeps lineage flat. (Large-star/small-star halves
    the round count at the price of mutating the edge list each round;
    hash-min keeps the edge table static — the better trade when the
    edge list is the 100-TB side and diameters are small.)"""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    und = (edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b"))
           .unionByName(edges.select(F.col(dst_col).alias("a"),
                                     F.col(src_col).alias("b")))
           .distinct().localCheckpoint(eager=True))
    lab = (und.select(F.col("a").alias("node")).distinct()
           .select("node", F.col("node").alias("label")))
    for _ in range(n_iter):
        nbr = (und.join(lab.withColumnRenamed("node", "b"), "b")
               .groupBy(F.col("a").alias("node"))
               .agg(F.min("label").alias("nm")))
        lab = (lab.join(nbr, "node", "left")
               .select("node",
                       F.expr("least(label, coalesce(nm, label))")
                       .alias("label"))
               .localCheckpoint(eager=True))
    return lab.select("node", F.col("label").cast("long").alias("component"))
