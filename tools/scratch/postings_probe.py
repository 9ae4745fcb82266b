"""Decompose the postings job at local[C]: map compute vs shuffle+sort
vs pack+write.  Usage: python tools/scratch/postings_probe.py C
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.analyzer import tokens_col
from go_mysql_elasticsearch_spark.index.build import POSTINGS_SCHEMA, _make_stream_packer
from go_mysql_elasticsearch_spark.session import get_spark

C = int(sys.argv[1])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R = 128

spark = get_spark(app_name=f"pprobe-{C}", master=f"local[{C}]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
n = docs.count()
reps = spark.range(R).withColumnRenamed("id", "rep")
docs = (docs.crossJoin(reps).withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .drop("rep").repartition(64)).cache()
docs.count()

base = docs.select("doc_id", tokens_col("text").alias("_toks")).withColumn("dl", F.size("_toks"))
exploded = base.select("doc_id", "dl", F.posexplode("_toks").alias("pos", "_tok")).select(
    "doc_id", "dl", F.col("pos").cast("int").alias("pos"), F.xxhash64("_tok").alias("tid"))
sharded = exploded.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(32)).cast("int"))


def timeit(name, fn, reps=2):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    print(f"RESULT {name} cores={C}: best={min(walls)} walls={walls}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark.sparkContext.setJobDescription("P1 map-compute only")
timeit("P1_map", lambda: noop(sharded))

spark.sparkContext.setJobDescription("P3 map+shuffle+sort")
shuffled = sharded.repartition(32, "tid", "shard").sortWithinPartitions(
    "tid", "shard", "doc_id", "pos")
timeit("P3_shuffle_sort", lambda: noop(shuffled))

spark.sparkContext.setJobDescription("P2 full postings job")
packed = shuffled.mapInPandas(_make_stream_packer(128), schema=POSTINGS_SCHEMA)


def full():
    out = tempfile.mkdtemp(prefix=f"pprobe_{C}_")
    try:
        packed.write.mode("overwrite").parquet(os.path.join(out, "postings.parquet"))
    finally:
        shutil.rmtree(out, ignore_errors=True)


timeit("P2_full", full)

spark.sparkContext.setJobDescription("P4 pack, noop sink")
timeit("P4_pack_noop", lambda: noop(packed))
