"""Index aliases (atomic repoint, ES _aliases parity) and index
templates (pattern match, order precedence, build integration)."""

import json
import os
import threading

import pytest

from go_mysql_elasticsearch_spark.index.aliases import (
    delete_alias,
    get_aliases,
    open_alias,
    put_alias,
    resolve,
    update_aliases,
)
from go_mysql_elasticsearch_spark.index.build import DEFAULT_SETTINGS, build_index
from go_mysql_elasticsearch_spark.index.templates import (
    delete_template,
    put_template,
    settings_for,
)


def test_alias_crud_and_resolution(tmp_path):
    store = str(tmp_path / "store")
    assert get_aliases(store) == {}
    put_alias(store, "live", str(tmp_path / "idx_a"))
    assert resolve(store, "live") == str(tmp_path / "idx_a")
    # unaliased names resolve to themselves (ES: APIs accept either)
    assert resolve(store, "/some/literal/path") == "/some/literal/path"
    # put replaces (one-action repoint)
    put_alias(store, "live", str(tmp_path / "idx_b"))
    assert resolve(store, "live") == str(tmp_path / "idx_b")
    # remove with a stale pair 404s like ES; with the right pair works
    with pytest.raises(ValueError, match="does not point at"):
        update_aliases(store, [("remove", "live", str(tmp_path / "idx_a"))])
    delete_alias(store, "live")
    assert get_aliases(store) == {}


def test_alias_repoint_atomic_under_concurrent_reader(tmp_path):
    """A reader resolving while a writer repoints in a loop must always
    see one of the two valid targets — never a missing alias or a torn
    file (write-tmp-then-rename discipline)."""
    store = str(tmp_path / "store")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    put_alias(store, "live", a)
    seen, errors = set(), []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                seen.add(resolve(store, "live"))
            except Exception as e:  # torn JSON would raise here
                errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    for i in range(300):
        update_aliases(store, [("remove", "live", None), ("add", "live", a if i % 2 else b)])
    stop.set()
    t.join()
    assert not errors
    assert seen <= {a, b}  # "live" itself would mean a window with no alias


def test_template_precedence(tmp_path):
    store = str(tmp_path / "tpl")
    put_template(store, "base", "web-*", {"bm25_k1": 1.0, "bm25_b": 0.3}, order=0)
    put_template(store, "tune", "web-*", {"bm25_b": 0.6}, order=1)
    put_template(store, "other", "logs-*", {"bm25_k1": 9.9}, order=5)
    # higher order wins between templates; non-matching ignored
    assert settings_for(store, "web-docs") == {"bm25_k1": 1.0, "bm25_b": 0.6}
    # explicit creation settings override all templates
    assert settings_for(store, "web-docs", {"bm25_b": 0.9}) == {
        "bm25_k1": 1.0,
        "bm25_b": 0.9,
    }
    # nothing matches, nothing explicit -> None (engine defaults apply)
    assert settings_for(store, "unrelated") is None
    delete_template(store, "tune")
    assert settings_for(store, "web-docs") == {"bm25_k1": 1.0, "bm25_b": 0.3}


def test_build_applies_template_and_settings_persist(spark, tmp_path):
    store = str(tmp_path / "tpl")
    put_template(store, "t", "tpl-*", {"bm25_k1": 2.0}, order=0)
    idx = str(tmp_path / "tpl-myindex")
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    build_index(spark, docs, idx, n_segments=1, n_shards=1, template_store=store)
    with open(os.path.join(idx, "settings.json")) as f:
        st = json.load(f)
    assert st["bm25_k1"] == 2.0
    assert st["bm25_b"] == DEFAULT_SETTINGS["bm25_b"]  # untouched key keeps default
    # a non-matching index name gets plain defaults
    idx2 = str(tmp_path / "other-index")
    build_index(spark, docs, idx2, n_segments=1, n_shards=1, template_store=store)
    with open(os.path.join(idx2, "settings.json")) as f:
        assert json.load(f)["bm25_k1"] == DEFAULT_SETTINGS["bm25_k1"]


def test_open_alias_serves_target_and_pins_at_open(spark, tmp_path):
    from go_mysql_elasticsearch_spark.query.wand import bm25_topk

    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(spark, spark.createDataFrame([(0, "apple pie")], "doc_id long, text string"),
                a, n_segments=1, n_shards=1)
    build_index(spark, spark.createDataFrame([(7, "apple tart")], "doc_id long, text string"),
                b, n_segments=1, n_shards=1)
    store = str(tmp_path / "store")
    put_alias(store, "fruit", a)
    r1 = open_alias(spark, store, "fruit")
    assert [x["doc_id"] for x in bm25_topk(spark, r1, ["apple"], k=5).collect()] == [0]
    put_alias(store, "fruit", b)
    # reader opened before the repoint stays pinned to its index
    assert [x["doc_id"] for x in bm25_topk(spark, r1, ["apple"], k=5).collect()] == [0]
    r2 = open_alias(spark, store, "fruit")
    assert [x["doc_id"] for x in bm25_topk(spark, r2, ["apple"], k=5).collect()] == [7]


def test_search_template_store_crud_and_render(tmp_path):
    from go_mysql_elasticsearch_spark.index.search_templates import (
        delete_search_template,
        get_search_template,
        put_search_template,
        render_stored,
    )

    store = str(tmp_path / "tpls")
    put_search_template(store, "t1", "+{{a}} {{b}}")
    assert get_search_template(store, "t1") == "+{{a}} {{b}}"
    # upsert replaces
    put_search_template(store, "t1", "{{a}} only")
    assert render_stored(store, "t1", {"a": "x", "b": "y"}) == "x only"
    # missing id == the client's 404
    import pytest as _pytest

    with _pytest.raises(KeyError, match="nope"):
        get_search_template(store, "nope")
    assert delete_search_template(store, "t1") is True
    assert delete_search_template(store, "t1") is False
    with _pytest.raises(KeyError):
        render_stored(store, "t1", {})
    # the store file is never torn: tmp-then-replace leaves no .tmp
    import os as _os

    assert not any(p.endswith(".tmp") for p in _os.listdir(store))
