"""Driver-contract entry registry, split by operator area.

Each module exposes ``ENTRIES: dict[name, (callable, oracle_sql|None)]``
where the callable is ``(spark, sf_dir) -> DataFrame`` and the SQL runs
in DuckDB over the driver's pre-registered views. ``None`` SQL → the
driver records a rows-only check (reserved for genuinely
non-SQL-expressible ops).
"""

from __future__ import annotations


def all_entries() -> dict:
    from . import aggs, compound, pipeline_ops, relations, rowdoc, structured

    out: dict = {}
    for mod in (structured, compound, aggs, pipeline_ops, rowdoc, relations):
        overlap = set(out) & set(mod.ENTRIES)
        if overlap:
            raise ValueError(f"duplicate entry names: {overlap}")
        out.update(mod.ENTRIES)
    return out
