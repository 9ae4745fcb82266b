"""Interleaved A/B: r2 vs HEAD match_phrase on the bench big index.

Builds the 640k-doc replicated index ONCE, caches postings, then times
qb_phrase ('hash join') alternating r2/HEAD implementations 6x each in
the same JVM. Also reports which execution path (driver vs distributed)
the query takes and the toPandas vs scorer split on the driver path.
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import _replicated_docs  # noqa: E402
from go_mysql_elasticsearch_spark.index.build import build_index  # noqa: E402
from go_mysql_elasticsearch_spark.index.reader import IndexReader  # noqa: E402
from go_mysql_elasticsearch_spark.session import get_spark  # noqa: E402
from go_mysql_elasticsearch_spark.query import phrase as phrase_head  # noqa: E402
from go_mysql_elasticsearch_spark.query.wand import DRIVER_PATH_MAX_BYTES, term_ids  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="ab-phrase", master="local[32]")
idx = tempfile.mkdtemp(prefix="ab_bigidx_")
try:
    docs, n_docs = _replicated_docs(spark, SF_DIR, 128, parts=64)
    t0 = time.time()
    build_index(spark, docs, idx, n_segments=1, n_shards=32)
    print(f"build: {n_docs} docs in {time.time()-t0:.1f}s", flush=True)
    reader = IndexReader(spark, idx)
    postings = reader.postings().cache()
    postings.count()
    reader.postings = lambda: postings

    words = ["hash", "join"]
    tids = term_ids(spark, words)
    dfs = reader.df_lookup(list(tids.values()))
    est = sum(dfs.values()) * reader.bytes_per_posting
    print(f"dfs={dfs} bytes_per_posting={reader.bytes_per_posting:.2f} "
          f"est_bytes={est/1e6:.1f}MB cutover={DRIVER_PATH_MAX_BYTES/1e6:.0f}MB "
          f"path={'driver' if est <= DRIVER_PATH_MAX_BYTES else 'distributed'}", flush=True)

    def run(mod):
        t0 = time.time()
        mod.match_phrase(spark, reader, "hash join", k=10).collect()
        return time.time() - t0

    # warm both
    run(phrase_head)
    times = {"head": []}
    for i in range(6):
        times["head"].append(run(phrase_head))
    for k, v in times.items():
        v2 = sorted(v)
        print(f"{k}: min={v2[0]:.3f} med={v2[len(v2)//2]:.3f} all={[round(x,3) for x in v]}",
              flush=True)

    # end-to-end phase breakdown of one match_phrase call
    import go_mysql_elasticsearch_spark.query.phrase as PH
    from go_mysql_elasticsearch_spark.query.wand import term_ids as _ti
    t0 = time.time(); tm = _ti(spark, words); t_tid = time.time() - t0
    t0 = time.time(); d2 = reader.df_lookup(list(tm.values())); t_df = time.time() - t0
    t0 = time.time(); hits = PH._positional_hits(spark, reader, words, list(dict.fromkeys(words))); t_hits = time.time() - t0
    t0 = time.time()
    from pyspark.sql import functions as FF
    out = hits.select("doc_id", FF.round("raw", 6).alias("score")).orderBy(FF.desc("score"), FF.asc("doc_id")).limit(10).collect()
    t_sort = time.time() - t0
    print(f"phases: term_ids={t_tid:.3f} df_lookup={t_df:.3f} positional_hits(incl pull+score+createDF)={t_hits:.3f} sort+collect={t_sort:.3f}", flush=True)

    # driver-path split: pull vs scorer (HEAD impl internals)
    from pyspark.sql import functions as F
    import pandas as pd
    all_tids = list(tids.values())
    matched = reader.postings().where(F.col("tid").isin(all_tids)).select(
        "segment", "shard", "tid", "first_doc_id", "docs_vb", "tfs_vb", "dls_vb", "pos_vb")
    t0 = time.time(); pdf = matched.toPandas(); t_pull = time.time() - t0
    print(f"toPandas: {t_pull:.3f}s rows={len(pdf)} bytes~{pdf.memory_usage(deep=True).sum()/1e6:.0f}MB", flush=True)
    from go_mysql_elasticsearch_spark.query.scoring import idf as _idf
    idfs = {t: _idf(reader.n_docs, d) for t, d in dfs.items()}
    chain = [tids[w] for w in words]
    for name, mod in [("head", phrase_head)]:
        scorer = mod._make_positional_scorer(chain, chain, idfs, reader.avgdl, {}, None, None)
        t0 = time.time()
        frames = [scorer(g) for _, g in pdf.groupby(["segment", "shard"], sort=False)]
        print(f"scorer[{name}]: {time.time()-t0:.3f}s hits={sum(len(f) for f in frames)}", flush=True)
finally:
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
