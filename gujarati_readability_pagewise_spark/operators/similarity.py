"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query set → top-k cosine neighbours):

* ``brute_force_topk`` — exact: cross join + expression-level dot product
  (``zip_with``/``aggregate``, JVM-side) + per-query window top-k.  O(Q·N);
  the baseline and the verifier.
* ``lsh_topk`` — scale path: random-hyperplane LSH.  Each vector gets a
  ``n_planes``-bit signature (sign of dot with deterministic ±1
  hyperplanes); candidates share a signature block; exact ranking runs on
  candidates only.  The hyperplanes derive from a seeded hash of
  (plane, dim) — no RNG state, so task retries are deterministic, and the
  signature is a pure expression (no UDF).

At 10^12 rows the LSH signature is one narrow map; the candidate join
shuffles (signature, id) pairs, not vectors; only candidate pairs touch the
full embedding via the re-rank join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "brute_force_topk",
    "plane_signs",
    "lsh_topk",
    "lsh_near_pairs",
    "ivf_topk",
]


def cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (q_id, c_id, cos_sim, rk)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"))
    c = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"))
    pairs = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )


def plane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(plane, dim) parity."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            row.append(1.0 if h[0] & 1 else -1.0)
        planes.append(row)
    return planes


def _signature(vec_col, planes: list[list[float]]):
    """Bit-packed hyperplane signature as a small int expression."""
    sig = None
    for b, row in enumerate(planes):
        w = F.array(*[F.lit(v) for v in row])
        dot = F.aggregate(
            F.zip_with(vec_col, w, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        term = F.when(dot > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("int")


def _probe_flips(n_planes: int, probe_radius: int) -> list[int]:
    """Signature XOR masks for multi-probe: all bucket ids within Hamming
    distance ``probe_radius`` of the query's own bucket (0 = own bucket)."""
    from itertools import combinations

    flips = [0]
    for r in range(1, probe_radius + 1):
        for bits in combinations(range(n_planes), r):
            flips.append(sum(1 << b for b in bits))
    return flips


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    A seeded k-means fits ``n_cells`` centroids (Spark ML, distributed);
    every corpus vector lands in its nearest cell (the inverted list);
    each query probes its ``n_probe`` nearest cells and re-ranks the
    candidates exactly.  The scale path FAISS-style ANN takes: candidate
    cost is ~``n_probe/n_cells`` of the corpus, and the centroid table
    (n_cells × dim) broadcasts to every executor.

    ``n_probe`` is the recall/cost knob (n_probe == n_cells ≡ brute force).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = emb.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_emb"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(c.select("_v"))
    c = model.transform(c).select("c_id", "c_emb", "cell")
    # centroid table: tiny (n_cells x dim) — crossJoin broadcasts it
    cents = model.clusterCenters()
    cent_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
            "cell int, cent array<double>",
        )
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"))
    # rank cells per query by centroid distance; probe the n_probe nearest
    qc = q.crossJoin(cent_df).select(
        "q_id",
        "q_emb",
        "cell",
        F.aggregate(
            F.zip_with(F.col("q_emb"), F.col("cent"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    wq = W.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = qc.withColumn("cell_rk", F.row_number().over(wq)).filter(
        F.col("cell_rk") <= n_probe
    )
    pairs = (
        probed.join(c, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"))
        .distinct()
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )


def lsh_near_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    bands: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs at the crawl-scale shape: banded
    hyperplane-LSH blocking generates candidates, exact cosine verifies.

    The ``n_planes`` signature is split into ``bands`` independent bands
    (OR-amplification): a pair is a candidate iff ANY band matches, which
    lifts recall from p^n to 1-(1-p^r)^b for per-plane agreement p.  The
    candidate join is an equi-join on (band, band_sig) — ~12-byte rows, one
    shuffle, never all-pairs; only candidates touch the vectors in the
    cosine verify.  Replaces the crossJoin in the brute-force
    ``dedup_embedding`` baseline (same verify expression).
    Returns (a, b, cos) with a < b and cos > threshold.
    """
    if dim is None:
        row = emb.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError("cannot infer dim from an empty corpus; pass dim=")
        dim = len(row[0])
    if n_planes % bands:
        raise ValueError(f"n_planes={n_planes} not divisible by bands={bands}")
    planes = plane_signs(n_planes, dim)
    r = n_planes // bands
    band_sigs = [
        _signature(F.col(vec_col), planes[b * r : (b + 1) * r]) for b in range(bands)
    ]
    banded = emb.select(
        F.col(id_col).alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_sigs[b].alias("bsig"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "bb.band", "bb.bsig")
    a = banded.select(F.col("k").alias("a"), "band", "bsig")
    b = banded.select(F.col("k").alias("b"), "band", "bsig")
    pairs = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()  # a pair matching several bands counts once
    )
    # vectors enter only here, keyed by id — the candidate join above
    # shuffled ~12-byte (band, bsig, id) rows, never embeddings
    ea = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("ea"))
    eb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("eb"))
    return (
        pairs.join(ea, "a")
        .join(eb, "b")
        .select("a", "b", cosine(F.col("ea"), F.col("eb")).alias("cos"))
        .filter(F.col("cos") > threshold)
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k via hyperplane-signature blocking, multi-probe.

    Corpus vectors land in their own bucket; each query probes every bucket
    within Hamming distance ``probe_radius`` of its own — the standard
    multi-probe trick: near neighbours that straddle ``r`` hyperplanes are
    still found, at probe cost ``C(n,<=r)/2^n`` of the corpus.  Candidates
    are re-ranked exactly, so precision is 1; only recall is approximate.
    ``probe_radius`` is the recall/cost knob: 0 = own bucket only
    (cheapest, lowest recall), 1 = +n one-bit flips (default), 2 adds
    C(n,2) two-bit flips (recall → ~1 for near-duplicate workloads).
    """
    if dim is None:
        row = emb.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError(
                "cannot infer embedding dim from an empty corpus; pass dim="
            )
        dim = len(row[0])
    planes = plane_signs(n_planes, dim)
    c = emb.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_emb"),
        _signature(F.col(vec_col), planes).alias("sig"),
    )
    probe_flips = F.array(*[F.lit(f) for f in _probe_flips(n_planes, probe_radius)])
    # compute the n_planes-dot-product signature ONCE per query row, then
    # derive every probe bucket by XOR after the explode — the Generate
    # node keeps project-collapsing from re-inlining the signature per flip
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_emb"),
            _signature(F.col(vec_col), planes).alias("_sig"),
        )
        .select("q_id", "q_emb", "_sig", F.explode(probe_flips).alias("_flip"))
        .select(
            "q_id", "q_emb", F.col("_sig").bitwiseXOR(F.col("_flip")).alias("sig")
        )
    )
    pairs = (
        q.join(c, "sig")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"))
        .distinct()
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )
