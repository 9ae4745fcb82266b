"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of
the query vector against the table, dot products via ``F.aggregate``/
``zip_with`` (JVM, no Python). The scale path is random-hyperplane LSH
bucketing: candidates come from matching sign-bit prefixes, so the
full-table scan becomes a bucket-key join (same shape as the MinHash
band join in dedup.py). Hyperplanes are deterministic (md5-seeded), so
results are reproducible with no stored model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of one vector (excluding itself)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    out = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 4).alias("cos"),
        )
    )
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def cosine_near_dups(emb: DataFrame, threshold: float = 0.35, max_id: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    round(cos, 4) >= threshold. Exact all-pairs baseline (the oracle
    shape); at 10^9+ vectors, prefilter candidates with the LSH bucket
    join in :func:`lsh_signatures` (same band-join shape as MinHash
    dedup) so the n² comparison happens only within buckets.
    Threshold applies to the ROUNDED cosine so Spark/DuckDB float
    boundaries agree."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    if max_id is not None:
        e = e.where(F.col("vec_id") < max_id)
    a = e.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 4
    ).alias("cos")
    return (
        pairs.select("a", "b", cos)
        .where(F.col("cos") >= threshold)
        .orderBy(F.asc("a"), F.asc("b"))
    )


def _hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 —
    reproducible across engines and runs, no RNG state."""
    import hashlib

    w = []
    for j in range(dim):
        hx = hashlib.md5(f"plane{plane_id}#{j}".encode()).hexdigest()[:8]
        w.append((int(hx, 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return w


def lsh_signatures(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """(vec_id, sig) — sign-bit signature under deterministic planes."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dim = e.select(F.size("v")).first()[0]
    sig = None
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bit = F.when(_dot(F.col("v"), w) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return e.select("vec_id", sig.cast("long").alias("sig"), "v")


def lsh_ann_topk(emb: DataFrame, query_vec_id: int, k: int = 5, n_planes: int = 8) -> DataFrame:
    """ANN: candidates share the LSH bucket (or differ by ≤1 bit), then
    exact cosine re-rank. At 10^9+ vectors the bucket join replaces the
    full scan; recall/latency trades via n_planes."""
    sigs = lsh_signatures(emb, n_planes)
    q = sigs.where(F.col("vec_id") == query_vec_id).select(
        F.col("sig").alias("qsig"), F.col("v").alias("qv")
    )
    j = sigs.crossJoin(F.broadcast(q)).where(F.col("vec_id") != query_vec_id)
    # hamming(sig, qsig) <= 1 → bucket or adjacent bucket
    ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig")))
    cand = j.where(ham <= 1)
    out = cand.select(
        "vec_id",
        F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 4).alias("cos"),
    )
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
