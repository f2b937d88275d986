"""Similarity search over ``array<float>`` embedding columns.

Three tiers (north-star, BASELINE.json):

- ``sim_search``: exact brute-force cosine top-k for a fixed probe set —
  the correctness baseline, a broadcast-probe map-side join (the big
  side is scanned once; no shuffle of the corpus).
- ``ann_ivf``: IVF-style — assign every vector to its nearest of K
  centroids (broadcast), search only the probe's cell. At 100 TB the
  assignment is a one-pass map and the cell is a partition-pruned
  subset (~1/K of the corpus).
- ``embed_neardup``: all-pairs near-duplicate detection via
  random-hyperplane LSH bucketing + exact cosine verification — the
  embedding analog of MinHash dedup; never O(n²).

All dot products are JVM higher-order functions (functions/vectors.py);
hyperplanes are deterministic (fixed-seed) literal arrays broadcast
with the plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_trend_analysis_spark.functions.vectors import as_double, cosine, dot

EMBEDDING_DIM = 64
DEFAULT_PROBES = (0, 1, 2)


def sim_search(
    embeddings: DataFrame,
    probe_ids: tuple[int, ...] = DEFAULT_PROBES,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per probe (SURVEY §2.3 sim_search).

    Probes are a tiny broadcast side; the corpus is scanned once.
    Ranking uses the *rounded* similarity with a vec_id tie-break so
    selection is deterministic (and oracle-stable) even when two
    engines disagree in the last float ulp.
    """
    probes = embeddings.filter(F.col("vec_id").isin(*probe_ids)).select(
        F.col("vec_id").alias("probe_id"), as_double("embedding").alias("probe_vec")
    )
    corpus = embeddings.select("vec_id", as_double("embedding").alias("vec"))
    scored = (
        corpus.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("sim", F.round(cosine(F.col("probe_vec"), F.col("vec")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "vec_id", "sim", "rnk")
    )


def ann_ivf(
    embeddings: DataFrame,
    n_centroids: int = 8,
    probe_ids: tuple[int, ...] = (100, 101, 102),
    k: int = 5,
) -> DataFrame:
    """IVF-flat ANN: nearest-centroid cells, search the probe's cell.

    Centroids here are the first ``n_centroids`` corpus vectors (a
    deterministic, training-free codebook — at scale you'd k-means a
    sample, same plan shape). Assignment = broadcast join + row_number;
    the search then touches one cell instead of the corpus.
    """
    centroids = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), as_double("embedding").alias("cvec")
    )
    corpus = embeddings.select("vec_id", as_double("embedding").alias("vec"))
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .withColumn("csim", F.round(cosine(F.col("vec"), F.col("cvec")), 6))
        .withColumn("crnk", F.row_number().over(assign_w))
        .filter(F.col("crnk") == 1)
        .select("vec_id", "centroid_id", "vec")
    )
    probes = assigned.filter(F.col("vec_id").isin(*probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("centroid_id").alias("probe_cell"),
        F.col("vec").alias("probe_vec"),
    )
    in_cell = assigned.join(
        F.broadcast(probes), assigned.centroid_id == probes.probe_cell
    ).filter(F.col("vec_id") != F.col("probe_id"))
    rank_w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        in_cell.withColumn("sim", F.round(cosine(F.col("probe_vec"), F.col("vec")), 6))
        .withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "vec_id", "sim", "rnk")
    )


def embed_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid statistics: element-wise mean vector's norm.

    The vector-aggregation shape (posexplode → per-position mean →
    re-reduce) that underlies k-means/IVF training at scale: one
    shuffle on (label, position), everything JVM-side. Surfaced as a
    scalar norm so the oracle compares doubles, not array encodings.
    """
    per_pos = (
        embeddings.select(
            "label", F.posexplode(as_double("embedding")).alias("pos", "val")
        )
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
    )
    norms = per_pos.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    counts = embeddings.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return counts.join(norms, "label")


def _hyperplanes(n_planes: int, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → plan-stable)."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim)).tolist()


def embed_neardup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Near-duplicate vector pairs: hyperplane-LSH buckets + exact cosine.

    Signature bit p = sign(vec · plane_p); vectors agreeing on all
    ``n_planes`` bits land in one bucket (collision prob for angle θ is
    (1-θ/π)^P — near-dups at cos ≥ .95 collide with high prob). Bucket
    equi-join then exact-cosine filter. Output: (vec_id_a, vec_id_b,
    sim).
    """
    planes = _hyperplanes(n_planes)
    vec = as_double("embedding")
    sig = sum(
        [
            F.when(
                dot(vec, F.array(*[F.lit(v) for v in planes[p]])) > 0,
                F.lit(2**p).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for p in range(n_planes)
        ],
        F.lit(0).cast("long"),
    )
    sigs = embeddings.select("vec_id", vec.alias("vec"), sig.alias("bucket"))
    left = sigs.alias("l")
    right = sigs.alias("r")
    return (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .withColumn("sim", F.round(cosine(F.col("l.vec"), F.col("r.vec")), 6))
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("l.vec_id").alias("vec_id_a"),
            F.col("r.vec_id").alias("vec_id_b"),
            "sim",
        )
    )
