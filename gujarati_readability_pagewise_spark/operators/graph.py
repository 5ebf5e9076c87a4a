"""Link-graph operators: degrees + fixed-point PageRank.

A web-scale crawl pipeline ranks pages by link structure (host authority
feeds crawl scheduling and quality priors).  The reference has no graph
module; this follows the standard power-iteration PageRank re-expressed as
DataFrame joins + aggregations, like `operators/components` does for
connected components.

**Integer fixed-point arithmetic** makes the iteration exactly
reproducible across engines (and across partitionings): ranks are scaled
BIGINTs, the damping factor is the rational ``d_num/d_den`` applied with
integer floor division, and per-node contribution sums are integer sums —
order-insensitive, so the DuckDB oracle (the same iterations unrolled as
chained CTEs) matches bit-for-bit.  Float PageRank would drift by ulps
per iteration under different summation orders and could never be
hash-checked.

Scale shape per iteration: one join edges⋈ranks on src (ranks is the
small side at bounded node count; at web scale both sides hash-partition
on src and the join co-locates), one groupBy(dst) integer sum with
map-side combine, one left join back to the node set.  Dangling nodes
contribute nothing (documented variant); nodes with no in-edges get the
teleport base only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degrees", "pagerank_fixedpoint"]


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg, in_deg) from an edge list."""
    out = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("out_deg"))
    inn = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out.join(inn, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 5,
    scale: int = 10**9,
    d_num: int = 17,
    d_den: int = 20,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank_fp) after ``n_iter`` integer power iterations.

    rank_0   = scale div N
    rank_k+1 = (scale - scale·d) div N  +  (d_num · Σ_{u→v} (rank_k(u) div
               out(u))) div d_den
    — every operation is BIGINT arithmetic (Spark ``div`` ≡ DuckDB ``//``
    on non-negative operands), so the result is engine- and
    partitioning-independent.

    Loop hygiene: ``edges ⋈ outdeg`` is loop-INVARIANT, so it is joined
    once before the iteration (the per-iteration work is one join on the
    changing ranks + one integer-sum shuffle, not two joins), and the
    ranks are ``localCheckpoint``-ed every ``checkpoint_every`` iterations
    (pattern of operators/components) so the lineage tree and Catalyst
    re-resolution cost stay flat at n_iter=20+ instead of growing per
    iteration.
    """
    n_nodes = nodes.count()  # scalar for the teleport base (node set is small
    # relative to edges; at web scale precompute once and pass in)
    r0 = scale // n_nodes
    base = (scale * (d_den - d_num)) // (d_den * n_nodes)
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    # Hoist the static join: each edge annotated with its source's
    # out-degree once, reused by every iteration.  Materializing it
    # (localCheckpoint) is a fixed up-front cost that only amortizes over
    # longer runs — for short runs (n_iter <= checkpoint_every) the
    # recomputed join is cheaper than the materialization, and the rank
    # checkpoints below never fire there either, so the whole plan stays
    # small without any barrier.
    edges_deg = edges.join(outdeg, edges[src] == outdeg["node"]).select(
        F.col(src).alias("from"), F.col(dst).alias("to_"), "out_deg"
    )
    if checkpoint_every and n_iter > checkpoint_every:
        edges_deg = edges_deg.localCheckpoint()
    ranks = nodes.select(F.col("node"), F.lit(r0).cast("long").alias("rank_fp"))
    for i in range(n_iter):
        contrib = edges_deg.join(
            ranks, edges_deg["from"] == ranks["node"]
        ).select(
            F.col("to_").alias("to"),
            F.expr("rank_fp div out_deg").alias("c"),
        )
        sums = contrib.groupBy("to").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, nodes["node"] == sums["to"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"coalesce(({d_num} * s) div {d_den}, 0)")
                ).cast("long").alias("rank_fp"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks
