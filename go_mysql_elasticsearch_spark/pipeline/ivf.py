"""IVF (inverted-file) ANN — the coarse-quantizer scale path.

Complements the LSH path in similarity.py with the other standard ANN
index: deterministic k-means partitions the vector space into nlist
cells; the cell assignment PERSISTS beside the corpus (like the LSH
signature index and the postings manifests), and a query scans only its
``n_probe`` nearest cells — a cluster-id IN filter pushed into the
parquet scan instead of a full-table distance pass.

Determinism (no RNG state, reproducible across runs/engines): initial
centroids are the vectors of the ``nlist`` vec_ids with the smallest
md5(vec_id) — content-independent, seedless — followed by a fixed
number of Lloyd iterations; ties in assignment break toward the lower
cell id. Centroids are tiny (nlist × dim floats) and ride the plan as
literals — broadcast by construction, never a shuffle.

At 10^9+ vectors: assignment is one narrow pass per Lloyd iteration
(argmin over nlist literal centroids, whole-stage codegen), the cell
table is one groupBy(cell) avg, and queries touch n_probe/nlist of the
corpus. Recall/latency trades via (nlist, n_probe) exactly as in
FAISS-style IVF-Flat.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _dist2(v_col, centroid: list[float]) -> F.Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(v_col, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _assign_col(v_col, centroids: list[list[float]]) -> F.Column:
    """argmin over the centroid literals; ties → lower cell id."""
    dists = [_dist2(v_col, c) for c in centroids]
    best = F.least(*dists)
    out = F.lit(len(centroids) - 1)
    for j in range(len(centroids) - 2, -1, -1):
        out = F.when(dists[j] == best, F.lit(j)).otherwise(out)
    return out.cast("int")


def kmeans_deterministic(
    emb: DataFrame, nlist: int = 8, iters: int = 3
) -> list[list[float]]:
    """Seedless Lloyd's: init = vectors of the nlist smallest-md5(vec_id)
    rows, then ``iters`` assignment/mean rounds. Each round is ONE
    narrow Spark pass; only nlist × dim floats ever reach the driver."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seed_rows = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = e.select(_assign_col(F.col("v"), centroids).alias("cell"), "v")
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.element_at("v", i + 1)).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        by_cell = {r["cell"]: [r[f"c{i}"] for i in range(dim)] for r in means}
        centroids = [by_cell.get(j, centroids[j]) for j in range(nlist)]
    return centroids


def build_ivf_index(
    spark: SparkSession, emb: DataFrame, path: str, nlist: int = 8, iters: int = 3
) -> tuple[DataFrame, list[list[float]]]:
    """Persist (vec_id, cell) + centroids beside the corpus; idempotent
    (same resume contract as the postings manifests)."""
    cfile = os.path.join(path, "_centroids.json")  # "_" prefix: parquet readers skip it
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        centroids = kmeans_deterministic(emb, nlist, iters)
        e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        e.select("vec_id", _assign_col(F.col("v"), centroids).alias("cell")).write.mode(
            "overwrite"
        ).parquet(path)
        with open(cfile, "w") as f:
            json.dump(centroids, f)
    with open(cfile) as f:
        centroids = json.load(f)
    return spark.read.parquet(path), centroids


def ivf_ann_topk(
    emb: DataFrame,
    cells: DataFrame,
    centroids: list[list[float]],
    query_vec_id: int,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """ANN: probe the query's ``n_probe`` nearest cells (centroid
    distances computed driver-side — nlist floats), candidates =
    cell-id IN filter on the persisted assignment, exact cosine
    re-rank. Never touches the other nlist - n_probe cells."""
    import numpy as np

    spark = emb.sparkSession
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).first()
    if q is None:
        return spark.createDataFrame([], "vec_id long, cos double")
    qv = np.asarray(q["v"], dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    order = np.argsort(((cents - qv) ** 2).sum(axis=1), kind="stable")
    probe = [int(x) for x in order[:n_probe]]
    cand = cells.where(F.col("cell").isin(probe)).select("vec_id")
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    out = (
        cand.join(e, "vec_id")
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(_dot(F.col("v"), qcol) / (_norm(F.col("v")) * _norm(qcol)), 4).alias("cos"),
        )
    )
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
