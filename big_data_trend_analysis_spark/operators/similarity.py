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
    threshold: float = 0.4,
    bands: int = 6,
    bits_per_band: int = 4,
) -> DataFrame:
    """Similar-vector pairs: banded hyperplane LSH + exact cosine verify.

    Signature bit p = sign(vec · plane_p); the OR-of-bands construction
    (pairs colliding in ANY band become candidates, exactly like
    MinHash banding) trades precision for recall: per-band collision
    for angle θ is (1-θ/π)^r, any-band ≈ 1-(1-p_band)^b — ~0.7 recall
    at cos 0.4-0.5 with 6×4 bits, vs ~0.004 for a single 24-bit
    bucket. Candidates are then exact-cosine verified, so precision is
    restored; only recall is approximate (rows-only check by design).
    Output: (vec_id_a, vec_id_b, sim ≥ threshold).
    """
    planes = _hyperplanes(bands * bits_per_band)
    vec = as_double("embedding")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                sum(
                    [
                        F.when(
                            dot(
                                vec,
                                F.array(
                                    *[F.lit(v) for v in planes[b * bits_per_band + r]]
                                ),
                            )
                            > 0,
                            F.lit(2**r),
                        ).otherwise(F.lit(0))
                        for r in range(bits_per_band)
                    ],
                    F.lit(0),
                ).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    buckets = embeddings.select(
        "vec_id", vec.alias("vec"), F.explode(band_structs).alias("band")
    ).select("vec_id", "vec", "band.band_id", "band.band_val")
    left = buckets.alias("l")
    right = buckets.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_id_a"),
            F.col("r.vec_id").alias("vec_id_b"),
            F.col("l.vec").alias("vec_a"),
            F.col("r.vec").alias("vec_b"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    return (
        candidates.withColumn(
            "sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("vec_id_a", "vec_id_b", "sim")
    )
