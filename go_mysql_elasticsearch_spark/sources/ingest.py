"""Snapshot-source utilities — reference S1-S5/S9/S10 parity.

- S1/S2 bootstrap snapshot: ``spark.read.parquet`` IS the dump scan
  (columnar, parallel per-file tasks, snapshot-isolated) — the
  mysqldump/mydumper text pipeline (dump/dump.go:91-233) has no
  custom-code analogue here by design.
- S5 typed coercion with bad-row skip: ``read_typed`` applies
  ``try_cast`` per target column and drops rows whose PK fails to
  coerce — the reference's ErrSkip semantics (canal/dump.go:25-67).
- S9 wildcard table discovery: regex over the catalog, union of the
  matching same-schema tables (config/runtime.go:100-151 expands table
  patterns via information_schema RLIKE).
- S10 schema introspection: ``df.schema`` / catalog metadata — exposed
  as ``describe_source`` for parity completeness.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_typed(
    df: DataFrame,
    target_schema: dict[str, str],
    pk_cols: list[str],
) -> DataFrame:
    """S5: coerce columns to target types with try_cast; rows whose PK
    fails to coerce are skipped (ErrSkip, canal/dump.go:49-54); non-PK
    coercion failures become NULL (MySQL-lenient)."""
    out = df.select(
        *[
            F.col(c).try_cast(t).alias(c) if c in df.columns else F.lit(None).cast(t).alias(c)
            for c, t in target_schema.items()
        ]
    )
    for pk in pk_cols:
        out = out.where(F.col(pk).isNotNull())
    return out


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """S1 source resolution: one name, two source kinds.

    - ``catalog.db.table`` / ``db.table`` / bare table name (no path
      separator) → ``spark.read.table`` — this is how an ICEBERG table
      arrives when its catalog is configured on the cluster
      (``--conf spark.sql.catalog.<name>=...``): Iceberg's Catalyst
      extensions then contribute snapshot isolation plus partition/
      file pruning on top of the same DataFrame surface.
    - anything with a path separator → parquet directory scan.

    The engine downstream never branches on which: both produce the
    same DataFrame, the same predicate-pushdown surface, the same
    build plan. (The sandbox ships no Iceberg jars, so tests exercise
    the table path via temp views — the resolution logic is
    identical.)"""
    if "/" in ref or "\\" in ref:
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def discover_tables(spark: SparkSession, pattern: str, database: str | None = None) -> list[str]:
    """S9: regex table discovery over the catalog (the Spark analogue
    of `SELECT table_name FROM information_schema.tables WHERE
    table_name RLIKE ...`, config/runtime.go:118-136)."""
    rx = re.compile(pattern)
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return sorted(t.name for t in tables if rx.fullmatch(t.name))


def union_tables(spark: SparkSession, pattern: str, database: str | None = None) -> DataFrame:
    """S9: wildcard-rule multi-table scan → one UNION ALL frame (the
    reference merges matching shard tables into one index; SURVEY §2.6)."""
    names = discover_tables(spark, pattern, database)
    if not names:
        raise ValueError(f"no tables match {pattern!r}")
    out = spark.table(names[0])
    for n in names[1:]:
        out = out.unionByName(spark.table(n), allowMissingColumns=True)
    return out


def describe_source(df: DataFrame) -> list[tuple[str, str]]:
    """S10: (column, type) metadata, as `describe table` would show."""
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
