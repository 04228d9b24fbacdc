"""Embedding clustering + semantic dedup (SemDeDup, Abbas et al. 2023).

``kmeans`` is Lloyd's algorithm with two determinism choices that make it
reproducible across engines AND across re-runs at any parallelism:

- vectors are quantized to int64 micro-units (round(x * 1e6)) up front, so
  every distance and every centroid sum is EXACT integer arithmetic —
  partial-aggregation order cannot perturb results (float sums are
  order-dependent; at 1000 executors the task order is never the same
  twice);
- init is the k lowest-id vectors, and argmin ties break on centroid
  index.

Centroids (k x dim integers) live on the driver between iterations — the
same driver-sized-state contract as Spark MLlib's own KMeans; per-point
assignment is a JVM-only expression (array_min over (dist, cid) structs,
whole-stage-codegen friendly), and the centroid update is one
posexplode + groupBy(cid, pos) SUM — map-side combinable, shuffling only
k * dim * n_partitions partial rows.

``semantic_dedup`` is the SemDeDup shape: cluster first (cheap), then
all-pairs cosine ONLY within each cluster — the quadratic stage touches
c^2 instead of n^2 rows, which is the whole reason the method scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000.0  # micro-unit quantization: exact in int64 for |x| < 9e12


def _quantize(vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * QUANT).cast("long"),
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means over an embedding column; returns
    (id, cid, dist2) with dist2 the EXACT squared distance to the final
    centroid in quantized micro-units (int64).

    k and dim are driver-sized (centroid table is k x dim ints); the data
    side streams once per iteration with no Python and no driver gather.
    An emptied cluster keeps its previous centroid.
    """
    pts = vectors.select(
        F.col(id_col).alias("id"), _quantize(vec_col).alias("v")
    )
    pts = pts.persist()
    try:
        dim = len(pts.first()["v"])
        cents = [
            list(r["v"])
            for r in pts.orderBy("id").limit(k).collect()
        ]
        if len(cents) < k:
            raise ValueError(f"k={k} exceeds the number of vectors")

        def assign() -> DataFrame:
            choices = F.array(*[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            F.array(*[F.lit(c) for c in cent]),
                            lambda x, c: (x - c) * (x - c),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, d: acc + d,
                    ).alias("d"),
                    F.lit(j).alias("cid"),
                )
                for j, cent in enumerate(cents)
            ])
            best = F.array_min(choices)
            return pts.select(
                "id", "v",
                best["cid"].alias("cid"), best["d"].alias("dist2"),
            )

        for _ in range(iters):
            sums = (
                assign()
                .select("cid", F.posexplode("v").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new = {r["cid"]: [0] * dim for r in sums}
            for r in sums:
                # Python // floors toward -inf, matching SQL floor(s / n)
                new[r["cid"]][r["pos"]] = int(r["s"]) // int(r["n"])
            for j in range(k):
                if j in new:
                    cents[j] = new[j]

        return assign().select(
            F.col("id").alias(id_col), "cid", "dist2"
        )
    finally:
        pts.unpersist()


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings, then mark every vector
    that has a LOWER-id neighbor with cosine >= threshold in the SAME
    cluster as a semantic duplicate (keep = no such neighbor).

    Output: (id, cid, keep, n_dups) — n_dups counts the lower-id
    near-neighbors. The pairwise stage is confined within clusters, so
    cost is sum(|c|^2), not n^2; the cosine is rounded before comparison
    so accumulation order cannot flip the threshold test.
    """
    assigned = kmeans(vectors, k=k, iters=iters,
                      id_col=id_col, vec_col=vec_col)
    vecs = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("ve"),
    )
    a = assigned.join(vecs, assigned[id_col] == vecs["id"]).select(
        F.col(id_col).alias("id"), "cid", "ve"
    )
    lo = a.select(
        F.col("id").alias("id_a"), F.col("cid").alias("cid_a"),
        F.col("ve").alias("va"),
    )
    hi = a.select(
        F.col("id").alias("id_b"), F.col("cid").alias("cid_b"),
        F.col("ve").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(F.aggregate(
            F.col(c), F.lit(0.0), lambda acc, v: acc + v * v
        ))

    cos = F.round(dot / (norm("va") * norm("vb")), round_decimals)
    dups = (
        lo.join(hi, (F.col("cid_a") == F.col("cid_b"))
                & (F.col("id_a") < F.col("id_b")))
        .where(cos >= threshold)
        .groupBy(F.col("id_b").alias("id"))
        .agg(F.count("*").alias("n_dups"))
    )
    return (
        a.join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col), "cid",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            (F.coalesce("n_dups", F.lit(0)) == 0).alias("keep"),
        )
    )
