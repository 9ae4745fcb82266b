"""Driver-contract entry registry, split by operator area.

Each module exposes ``ENTRIES: dict[name, (callable, oracle_sql|None)]``
where the callable is ``(spark, sf_dir) -> DataFrame`` and the SQL runs
in DuckDB over the driver's pre-registered views. ``None`` SQL → the
driver records a rows-only check (reserved for genuinely
non-SQL-expressible ops).
"""

from __future__ import annotations


# Entries the round-1 driver gate did NOT record (its budget cut off after
# the first 50 registry keys). They run FIRST so every operator gets hard
# driver-side credit at least once; newly added round-2 entries also go
# here until a CORRECTNESS_r{N}.json shows them green.
_PRIORITY = [
    "agg_percentiles",
    "agg_top_hits",
    "pipeline_derivative",
    "pipeline_cumulative_sum",
    "pipeline_moving_avg",
    "pipeline_serial_diff",
    "pipeline_bucket_selector",
    "pipeline_bucket_script",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_pairs_exact",
    "dedup_simhash",
    "ann_cosine_brute",
    "ann_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_simhash_pairs",
    "text_lang_id",
    "text_quality",
    "text_token_counts",
    "text_fingerprint",
    "function_score_fvf",
    "function_score_weight",
    "bool_dis_max_nested",
    "agg_percentile_ranks",
    "index_stats",
    "pipeline_min_sum_bucket",
    "sessionize_events",
    "missing_lang",
    "sort_script",
    "indices_routing",
    "suggest_completion",
    "sort_multi",
    "rowdoc_convert",
    "query_string",
    "percolate",
    "rescore",
    "collapse",
    "highlight",
    "min_score",
    "from_size",
    "not_query",
    "has_child",
    "has_parent",
    "nested_query",
]


def all_entries() -> dict:
    from . import aggs, compound, pipeline_ops, relations, rowdoc, structured

    merged: dict = {}
    for mod in (structured, compound, aggs, pipeline_ops, rowdoc, relations):
        overlap = set(merged) & set(mod.ENTRIES)
        if overlap:
            raise ValueError(f"duplicate entry names: {overlap}")
        merged.update(mod.ENTRIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"priority entries not registered: {missing}")
    out: dict = {n: merged[n] for n in _PRIORITY}
    out.update({n: v for n, v in merged.items() if n not in out})
    return out
