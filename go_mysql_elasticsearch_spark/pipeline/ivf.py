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
cell id (numpy argmin takes the first minimum).

Centroids travel as a numpy array inside a ``mapInPandas`` closure
(task-broadcast with the serialized function), NOT as plan literals:
at real nlist (4k-65k) an ``F.when``-chain argmin is a megabyte-scale
Catalyst plan with O(nlist²) analysis cost, while the closure form is
one Arrow-batched matmul per batch regardless of nlist. The only
per-plan literal left is the single query vector (dim floats).

At 10^9+ vectors: assignment is one narrow pass per Lloyd iteration
(vectorized ``d² = |v|² - 2 v·Cᵀ + |C|²`` argmin per Arrow batch), the
cell table is one groupBy(cell) avg, and queries touch n_probe/nlist of
the corpus. Recall/latency trades via (nlist, n_probe) exactly as in
FAISS-style IVF-Flat.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _assign_fn(centroids: np.ndarray, carry_v: bool):
    """mapInPandas kernel: vectorized argmin over the closure centroid
    matrix. Ties break toward the lower cell id (argmin = first min)."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)  # (nlist, dim)
    c_sq = (cents * cents).sum(axis=1)  # (nlist,)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(pdf["v"].tolist(), dtype=np.float64)  # (n, dim)
            d2 = (v * v).sum(axis=1, keepdims=True) - 2.0 * (v @ cents.T) + c_sq
            out = pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "cell": d2.argmin(axis=1).astype("int32")})
            if carry_v:
                out["v"] = pdf["v"].to_numpy()
            yield out

    return fn


def assign_cells(e: DataFrame, centroids: list[list[float]], carry_v: bool = False) -> DataFrame:
    """(vec_id, v) → (vec_id, cell[, v]) via one Arrow-batched pass."""
    schema = "vec_id long, cell int" + (", v array<double>" if carry_v else "")
    return e.select("vec_id", "v").mapInPandas(
        _assign_fn(np.asarray(centroids, dtype=np.float64), carry_v), schema=schema
    )


def kmeans_deterministic(
    emb: DataFrame, nlist: int = 8, iters: int = 3
) -> list[list[float]]:
    """Seedless Lloyd's: init = vectors of the nlist smallest-md5(vec_id)
    rows, then ``iters`` assignment/mean rounds. Each round is ONE
    narrow Spark pass; only nlist × dim floats ever reach the driver.
    nlist is clamped to the corpus size (a tiny table can't seed more
    cells than it has vectors)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seed_rows = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    )
    nlist = min(nlist, len(seed_rows))
    centroids = [list(r["v"]) for r in seed_rows[:nlist]]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_cells(e, centroids, carry_v=True)
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
    (same resume contract as the postings manifests). The rebuild gate
    requires BOTH the parquet _SUCCESS and the centroid sidecar, so a
    crash between the parquet commit and the sidecar write leaves a dir
    that rebuilds on the next call instead of raising forever."""
    cfile = os.path.join(path, "_centroids.json")  # "_" prefix: parquet readers skip it
    if not (os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(cfile)):
        centroids = kmeans_deterministic(emb, nlist, iters)
        e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # overwrite wipes the dir, so the sidecar must come after
        assign_cells(e, centroids).write.mode("overwrite").parquet(path)
        tmp = cfile + ".tmp"
        with open(tmp, "w") as f:
            json.dump(centroids, f)
        os.replace(tmp, cfile)
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
    re-rank. Never touches the other nlist - n_probe cells. The only
    plan literal is the query vector itself (dim floats)."""
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
