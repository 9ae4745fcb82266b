"""Profile the positional scorer internals on the big-index qb_phrase workload."""
import cProfile
import io
import os
import pstats
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
from go_mysql_elasticsearch_spark.query import phrase as P  # noqa: E402
from go_mysql_elasticsearch_spark.query.wand import term_ids  # noqa: E402
from go_mysql_elasticsearch_spark.query.scoring import idf as _idf  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof-phrase", master="local[32]")
idx = tempfile.mkdtemp(prefix="prof_bigidx_")
try:
    docs, n_docs = _replicated_docs(spark, SF_DIR, 128, parts=64)
    build_index(spark, docs, idx, n_segments=1, n_shards=32)
    reader = IndexReader(spark, idx)
    words = ["hash", "join"]
    tids = term_ids(spark, words)
    dfs = reader.df_lookup(list(tids.values()))
    idfs = {t: _idf(reader.n_docs, d) for t, d in dfs.items()}
    chain = [tids[w] for w in words]
    matched = reader.postings().where(F.col("tid").isin(list(tids.values()))).select(
        "segment", "shard", "tid", "first_doc_id", "docs_vb", "tfs_vb", "dls_vb", "pos_vb")
    pdf = matched.toPandas()
    groups = [g for _, g in pdf.groupby(["segment", "shard"], sort=False)]
    scorer = P._make_positional_scorer(chain, chain, idfs, reader.avgdl, {}, None, None)

    # phase timing: _TidPostings build vs rest
    t0 = time.time()
    for g in groups:
        g2 = g[g["tid"] != -1]
        for tid, sub in g2.groupby("tid"):
            P._TidPostings(sub)
    print(f"decode-only (all groups): {time.time()-t0:.3f}s", flush=True)

    t0 = time.time()
    for g in groups:
        scorer(g)
    print(f"full scorer (all groups): {time.time()-t0:.3f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    for g in groups:
        scorer(g)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue(), flush=True)
finally:
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
