"""Python-side wait-vs-compute split inside the pack stage.
Usage: python tools/scratch/pack_instr.py C
Prints per-task (wait_s, compute_s, rows) lines collected via an
accumulator, then aggregates.
"""
import os
import sys
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

spark = get_spark(app_name=f"packinstr-{C}", master=f"local[{C}]", shuffle_partitions=32)
sc = spark.sparkContext
acc_wait = sc.accumulator(0.0)
acc_comp = sc.accumulator(0.0)
acc_rows = sc.accumulator(0)

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
shuffled = sharded.repartition(32, "tid", "shard").sortWithinPartitions(
    "tid", "shard", "doc_id", "pos")

inner = _make_stream_packer(128)


def instrumented(batches):
    def timed_iter(it):
        while True:
            t0 = time.time()
            try:
                b = next(it)
            except StopIteration:
                acc_wait.add(time.time() - t0)
                return
            acc_wait.add(time.time() - t0)
            acc_rows.add(len(b))
            yield b

    t_start = time.time()
    out_iter = inner(timed_iter(iter(batches)))
    while True:
        t0 = time.time()
        try:
            o = next(out_iter)
        except StopIteration:
            break
        acc_comp.add(time.time() - t0)
        yield o
    # note: wait time is inside acc_wait; compute = acc_comp - wait portion
    acc_comp.add(-(time.time() - t_start) * 0)


packed = shuffled.mapInPandas(instrumented, schema=POSTINGS_SCHEMA)

for rep in range(2):
    w0, c0, r0 = acc_wait.value, acc_comp.value, acc_rows.value
    t0 = time.time()
    packed.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"RESULT cores={C} rep={rep} wall={wall:.2f} "
          f"py_wait={acc_wait.value - w0:.2f} py_total_out={acc_comp.value - c0:.2f} "
          f"rows={acc_rows.value - r0}", flush=True)
