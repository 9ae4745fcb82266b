"""Product quantization (PQ) ANN — the memory-compression scale path.

Complements the IVF coarse quantizer (ivf.py) with the other half of
the FAISS-style toolbox: each vector is split into ``m`` subspaces and
each subspace quantized to one of ``ks`` centroids, so a D-dim float64
vector stores as ``m`` small codes (64-dim × 8 B = 512 B → m bytes:
128-512× compression). At 10^10 vectors the exact-vector table cannot
live in executor memory, but the PQ code table can — queries scan the
CODES with an additive-distance lookup (ADC) and only the top-R
candidates touch the full vectors for exact re-rank.

Determinism (cross-run AND cross-engine, same contract as ivf.py):
per-subspace codebooks come from the same seedless Lloyd recipe —
init = sub-vectors of the ``ks`` smallest-md5(vec_id) rows, fixed
iteration count, argmin ties to the lower code, empty cells keep their
previous centroid — so the DuckDB oracle replays training, encoding
and ADC search exactly (entries/pipeline_ops.py pq_oracle_sql).

Spark shape at scale:
- train: m × iters narrow passes (vectorized d² argmin per Arrow
  batch; only m × ks × D/m floats reach the driver);
- encode: ONE mapInPandas pass emitting (vec_id, code_0..code_{m-1});
  the code table persists beside the corpus (resume contract);
- query: the per-subspace distance LUT (m × ks floats) is computed
  driver-side and inlined as plan literals — ADC is a pure-Catalyst
  projection over the code table (element_at + addition, whole-stage
  codegen, NO join and NO Python), then top-R by ADC, then exact
  cosine re-rank of R rows. Result: the 10^10-vector scan is
  code-table-sized and JVM-only.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivf import kmeans_deterministic
from .similarity import _dot, _norm


def _sub(j: int, m: int, dim: int) -> tuple[int, int]:
    """Subspace j's (start, length) — equal splits, dim % m == 0."""
    sublen = dim // m
    return j * sublen, sublen


def pq_train(
    emb: DataFrame, m: int = 2, ks: int = 4, iters: int = 2, dim: int = 64
) -> list[list[list[float]]]:
    """Per-subspace deterministic codebooks: codebooks[j][c] is the
    c-th centroid of subspace j. Reuses the IVF Lloyd kernel on sliced
    vectors — every subspace seeds from the SAME ks smallest-md5
    vec_ids, so the oracle needs one seed rule, not m."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    out = []
    for j in range(m):
        start, sublen = _sub(j, m, dim)
        sub = emb.select(
            "vec_id",
            F.slice(F.col("embedding").cast("array<double>"), start + 1, sublen).alias("embedding"),
        )
        out.append(kmeans_deterministic(sub, nlist=ks, iters=iters))
    return out


def _encode_fn(codebooks: list[np.ndarray], m: int, dim: int):
    """mapInPandas kernel: per-subspace argmin over the closure
    codebooks in one pass (same d² expansion as ivf._assign_fn, so the
    SQL twin's row_number ordering reproduces the codes exactly)."""
    prepped = []
    for j, cb in enumerate(codebooks):
        c = np.ascontiguousarray(cb, dtype=np.float64)
        prepped.append((c, (c * c).sum(axis=1)))

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for j, (c, c_sq) in enumerate(prepped):
                start, sublen = _sub(j, m, dim)
                vj = v[:, start:start + sublen]
                d2 = (vj * vj).sum(axis=1, keepdims=True) - 2.0 * (vj @ c.T) + c_sq
                out[f"code{j}"] = d2.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return fn


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]], dim: int = 64) -> DataFrame:
    m = len(codebooks)
    schema = "vec_id long, " + ", ".join(f"code{j} int" for j in range(m))
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).mapInPandas(
        _encode_fn([np.asarray(cb, dtype=np.float64) for cb in codebooks], m, dim),
        schema=schema,
    )


def build_pq_index(
    spark: SparkSession, emb: DataFrame, path: str,
    m: int = 2, ks: int = 4, iters: int = 2, dim: int = 64,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Persist the code table + codebook sidecar beside the corpus;
    idempotent under the same both-artifacts-or-rebuild gate as the
    IVF index."""
    cfile = os.path.join(path, "_codebooks.json")
    if not (os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(cfile)):
        codebooks = pq_train(emb, m=m, ks=ks, iters=iters, dim=dim)
        pq_encode(emb, codebooks, dim=dim).write.mode("overwrite").parquet(path)
        tmp = cfile + ".tmp"
        with open(tmp, "w") as f:
            json.dump(codebooks, f)
        os.replace(tmp, cfile)
    with open(cfile) as f:
        codebooks = json.load(f)
    return spark.read.parquet(path), codebooks


def pq_ann_topk(
    emb: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec_id: int,
    k: int = 5,
    rerank: int = 20,
    dim: int = 64,
) -> DataFrame:
    """ADC search: per-subspace LUT of ||q_j − centroid||² (m × ks
    floats, driver-side, inlined as plan literals), approx distance =
    Σ_j lut_j[code_j] as a pure-Catalyst projection over the code
    table; top-``rerank`` by (round(adc, 6), vec_id) then exact cosine
    re-rank of those R rows only. ADC is rounded before ordering in
    BOTH engines so last-ulp float noise cannot flip the candidate
    set."""
    spark = emb.sparkSession
    m = len(codebooks)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).first()
    if q is None:
        return spark.createDataFrame([], "vec_id long, cos double")
    qv = np.asarray(q["v"], dtype=np.float64)

    adc = None
    for j in range(m):
        start, sublen = _sub(j, m, dim)
        qj = qv[start:start + sublen]
        c = np.asarray(codebooks[j], dtype=np.float64)
        # same expansion as the SQL twin: |q|² − 2 q·c + |c|²
        lut = (qj @ qj) - 2.0 * (c @ qj) + (c * c).sum(axis=1)
        term = F.element_at(F.array(*[F.lit(float(x)) for x in lut]), F.col(f"code{j}") + 1)
        adc = term if adc is None else adc + term
    cand = (
        codes.select("vec_id", F.round(adc, 6).alias("adc"))
        .where(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(rerank)
    )
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    out = cand.join(e, "vec_id").select(
        "vec_id",
        F.round(_dot(F.col("v"), qcol) / (_norm(F.col("v")) * _norm(qcol)), 4).alias("cos"),
    )
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
