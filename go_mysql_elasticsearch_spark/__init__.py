"""PySpark-native full-text indexing + BM25 query engine.

A from-scratch Spark-first re-expression of the capabilities of
ehalpern/go-mysql-elasticsearch (a MySQL→Elasticsearch CDC full-text
sync pipeline): durable, resumable, batched inverted-index construction
from a table source, and rank-correct BM25 top-k retrieval with the
Elasticsearch query-operator surface the reference targets.

Not a port: the reference is a row-oriented Go binlog tailer feeding
ES bulk HTTP; this engine is columnar (parquet/Arrow scans), declares
its dataflow with the DataFrame API so Catalyst optimizes it, and
implements only the genuinely novel parts (posting-block codec,
block-max WAND, skew salting) as vectorized Arrow UDFs.
"""

__version__ = "0.1.0"
