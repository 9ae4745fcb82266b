"""Model-based fuzz of the admin layer (aliases / open-close /
settings / merge / CDC upserts / cluster_health), in the style of
tests/test_cdc_model.py: a seeded random op sequence drives BOTH the
engine and a plain-python model; invariants are checked after every
op. The CDC twin of this test found a real duplicate-doc bug in round
5 — the admin surface deserves the same treatment.

Invariants:
- a query through an alias returns exactly the LIVE doc set of the
  index the model says the alias points at (content, not just counts);
- a closed index refuses to open (IndexClosedError) and reopens clean;
- get_settings reflects every dynamic put_settings in model order;
- cluster_health mirrors the model's PHYSICAL doc counts (manifest
  sums: tombstoned versions count until a merge GCs them — Lucene
  docs.count semantics) and closed flags; after a forcemerge the
  physical count collapses to the live count;
- forcemerge changes segment count but NEVER the served doc set.
"""

import random

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.aliases import open_alias, put_alias
from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.indices import (
    IndexClosedError,
    close_index,
    cluster_health,
    forcemerge,
    get_settings,
    open_index,
    put_settings,
)
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.streaming.incremental import apply_changes

N_OPS = 14
WORDS = ["alpha", "beta", "gamma", "delta"]


def _mkdocs(rng, next_id, n):
    return [
        (next_id + i, " ".join(rng.choices(WORDS, k=4))) for i in range(n)
    ]


def _live_docs(spark, index_dir):
    r = IndexReader(spark, index_dir)
    return {
        (x["doc_id"], x["text"]) for x in r.docstore().select("doc_id", "text").collect()
    }


@pytest.mark.parametrize("seed", [11, 23])
def test_admin_model_random_ops(spark, tmp_path, seed):
    rng = random.Random(seed)
    names = ["ia", "ib"]
    model = {}  # name -> {"docs": {id: text}, "closed": bool, "settings": {}}
    next_id = 0

    for name in names:
        rows = _mkdocs(rng, next_id, 3)
        next_id += 3
        build_index(
            spark,
            spark.createDataFrame(rows, "doc_id long, text string"),
            str(tmp_path / name),
            n_segments=1,
            n_shards=1,
        )
        model[name] = {"docs": dict(rows), "closed": False, "settings": {}, "physical": len(rows)}

    store = str(tmp_path / "aliases")
    alias_target = rng.choice(names)
    put_alias(store, "live", str(tmp_path / alias_target))

    for step in range(N_OPS):
        name = rng.choice(names)
        idx = str(tmp_path / name)
        op = rng.choice(
            ["upsert", "delete", "repoint", "close_open", "settings", "merge", "snapshot"]
        )

        if model[name]["closed"] and op in ("upsert", "delete", "merge", "snapshot"):
            op = "close_open"  # writes on a closed index: just reopen

        if op == "upsert":
            # mix of brand-new ids and overwrites of existing ones
            rows = _mkdocs(rng, next_id, rng.randint(1, 3))
            next_id += len(rows)
            if model[name]["docs"] and rng.random() < 0.7:
                oid = rng.choice(sorted(model[name]["docs"]))
                rows.append((oid, "rewritten " + rng.choice(WORDS)))
            ch = spark.createDataFrame(
                [(i, t, "update") for i, t in rows], "doc_id long, text string, action string"
            )
            apply_changes(spark, idx, ch, n_shards=1)
            model[name]["docs"].update(dict(rows))
            model[name]["physical"] += len(rows)  # old versions stay until merge
        elif op == "delete":
            if model[name]["docs"]:
                victim = rng.choice(sorted(model[name]["docs"]))
                ch = spark.createDataFrame(
                    [(victim, None, "delete")], "doc_id long, text string, action string"
                )
                apply_changes(spark, idx, ch, n_shards=1)
                del model[name]["docs"][victim]
        elif op == "repoint":
            alias_target = rng.choice(names)
            put_alias(store, "live", str(tmp_path / alias_target))
        elif op == "close_open":
            if model[name]["closed"]:
                open_index(idx)
                model[name]["closed"] = False
            else:
                close_index(idx)
                model[name]["closed"] = True
        elif op == "settings":
            k1 = round(rng.uniform(0.8, 2.0), 2)
            put_settings(idx, {"bm25_k1": k1})
            model[name]["settings"]["bm25_k1"] = k1
        elif op == "merge":
            forcemerge(spark, idx, max_num_segments=1)  # must not change docs
            model[name]["physical"] = len(model[name]["docs"])  # GC collapses to live
        elif op == "snapshot":
            # snapshot → restore to a dir OUTSIDE the health store →
            # the restored index serves exactly the as-of doc set
            from go_mysql_elasticsearch_spark.index.snapshot import (
                restore_index,
                snapshot_index,
            )

            snap = str(tmp_path.parent / f"snap_{seed}_{step}")
            dest = str(tmp_path.parent / f"restored_{seed}_{step}")
            snapshot_index(idx, snap)
            as_of = dict(model[name]["docs"])
            # mutate the SOURCE after the snapshot so staleness is detectable
            rows = _mkdocs(rng, next_id, 1)
            next_id += 1
            ch = spark.createDataFrame(
                [(i, t, "update") for i, t in rows], "doc_id long, text string, action string"
            )
            apply_changes(spark, idx, ch, n_shards=1)
            model[name]["docs"].update(dict(rows))
            model[name]["physical"] += 1
            restore_index(snap, dest)
            assert _live_docs(spark, dest) == set(as_of.items()), (
                f"seed={seed} step={step} restored snapshot diverged"
            )

        # ---- invariants after every op ----
        for n2 in names:
            d2 = str(tmp_path / n2)
            if model[n2]["closed"]:
                with pytest.raises(IndexClosedError):
                    IndexReader(spark, d2)
            else:
                assert _live_docs(spark, d2) == set(model[n2]["docs"].items()), (
                    f"seed={seed} step={step} op={op} index={n2}"
                )
                st = get_settings(d2)
                for k, v in model[n2]["settings"].items():
                    assert st[k] == v

        if not model[alias_target]["closed"]:
            via_alias = open_alias(spark, store, "live")
            got = {
                (x["doc_id"], x["text"])
                for x in via_alias.docstore().select("doc_id", "text").collect()
            }
            assert got == set(model[alias_target]["docs"].items())

        h = cluster_health(str(tmp_path))
        assert h["n_docs"] == sum(m["physical"] for m in model.values())
        expect = (
            "yellow" if any(m["closed"] for m in model.values()) else "green"
        )
        assert h["status"] == expect, (h, model)
