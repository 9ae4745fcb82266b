"""Index reader: discovers completed segments via manifests and exposes
postings / docstore / global term dictionary DataFrames.

Only segments with a ``manifest.json`` are visible — an interrupted
build's partial segment is invisible until its manifest lands (same
contract as the reference's binlog checkpoint: canal/master.go:16-45).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.manifests: list[dict] = []
        for mp in sorted(glob.glob(os.path.join(index_dir, "segments", "seg=*", "manifest.json"))):
            with open(mp) as f:
                self.manifests.append(json.load(f))
        if not self.manifests:
            raise FileNotFoundError(f"no completed segments under {index_dir}")

    # ---- global collection stats (cheap: from manifests, no scan) --------
    @property
    def n_docs(self) -> int:
        return sum(m["n_docs"] for m in self.manifests)

    @property
    def avgdl(self) -> float:
        n = self.n_docs
        return (sum(m["sum_dl"] for m in self.manifests) / n) if n else 0.0

    def _seg_paths(self, name: str) -> list[tuple[str, str]]:
        return [
            (m["segment_id"], os.path.join(self.index_dir, "segments", f"seg={m['segment_id']}", name))
            for m in self.manifests
        ]

    def _union(self, name: str) -> DataFrame:
        dfs = []
        for seg_id, p in self._seg_paths(name):
            dfs.append(self.spark.read.parquet(p).withColumn("segment", F.lit(str(seg_id))))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def postings(self) -> DataFrame:
        return self._union("postings.parquet")

    def docstore(self) -> DataFrame:
        return self._union("docs.parquet")

    def global_dict(self) -> DataFrame:
        """(term, df) across segments — the idf source.

        Per-segment dicts are small (≤ vocab size); the union+groupBy is
        a metadata-scale aggregation even at 10^12 docs (vocab ≪ corpus).
        """
        return (
            self._union("dict.parquet")
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"), F.max("max_tf").alias("max_tf"))
        )

    def tombstones(self) -> DataFrame | None:
        p = os.path.join(self.index_dir, "tombstones.parquet")
        if glob.glob(os.path.join(p, "*.parquet")) or os.path.exists(p):
            return self.spark.read.parquet(p)
        return None
