"""Index aliases — the ES alias API analog (vendored client:
indices_put_alias.go:1, indices_get_aliases.go:1,
indices_delete_alias.go, and the batched ``_aliases`` actions endpoint
indices_put_alias.go AliasService.Do, which applies add+remove in one
atomic cluster-state update).

Aliases are how real ES deployments do zero-downtime reindex cutover:
build the new index, then repoint the alias in one atomic action — no
reader ever sees a half-switched state. This engine already has the
generation-swap story for in-place compaction
(streaming/incremental.py:81-141); the alias layer adds the *named
indirection* across whole index directories.

Storage: one ``aliases.json`` per alias store (a directory that holds
index dirs — the "cluster state"). Every mutation rewrites the file
via write-tmp-then-``os.replace``, so a concurrent ``resolve()``
always reads a complete former-or-current mapping, never a torn one —
the same manifest-last convention used everywhere else in the index
layer. Single writer assumed (as for index maintenance); readers are
unrestricted.

Scale note: the alias file is cluster metadata (bytes, not data) —
resolution is one driver-side read per reader open, nothing touches
the executors.
"""

from __future__ import annotations

import json
import os

ALIAS_FILE = "aliases.json"


def _path(store_dir: str) -> str:
    return os.path.join(store_dir, ALIAS_FILE)


def get_aliases(store_dir: str) -> dict[str, str]:
    """alias name → index dir (indices_get_aliases.go surface)."""
    p = _path(store_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def update_aliases(store_dir: str, actions: list[tuple[str, str, str | None]]) -> dict[str, str]:
    """Apply a batch of ``("add"|"remove", alias, index_dir)`` actions
    in ONE atomic write — the ``_aliases`` endpoint semantics: a
    repoint is ``[("remove", a, old), ("add", a, new)]`` (or just an
    ``add``, which replaces) and readers see either the old or the new
    mapping, never neither."""
    aliases = get_aliases(store_dir)
    for action, alias, index_dir in actions:
        if action == "add":
            if index_dir is None:
                raise ValueError(f"add for {alias!r} needs an index_dir")
            aliases[alias] = os.path.abspath(index_dir)
        elif action == "remove":
            cur = aliases.get(alias)
            if index_dir is not None and cur != os.path.abspath(index_dir):
                # ES 404s on remove of a non-matching pair; keep parity
                raise ValueError(f"alias {alias!r} does not point at {index_dir!r}")
            aliases.pop(alias, None)
        else:
            raise ValueError(f"unknown alias action {action!r}")
    os.makedirs(store_dir, exist_ok=True)
    tmp = _path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(store_dir))  # the atomic repoint
    return aliases


def put_alias(store_dir: str, alias: str, index_dir: str) -> dict[str, str]:
    """indices_put_alias.go: point ``alias`` at ``index_dir``
    (replacing any previous target — one-action repoint)."""
    return update_aliases(store_dir, [("add", alias, index_dir)])


def delete_alias(store_dir: str, alias: str) -> dict[str, str]:
    """indices_delete_alias.go."""
    return update_aliases(store_dir, [("remove", alias, None)])


def resolve(store_dir: str, name: str) -> str:
    """Resolve ``name`` to an index dir: alias indirection if the name
    is aliased, else the name itself taken as a literal path — the ES
    convention that search APIs accept index names and aliases
    interchangeably."""
    return get_aliases(store_dir).get(name, name)


def open_alias(spark, store_dir: str, name: str):
    """IndexReader over the alias target (resolved at open — an ES
    searcher pins the index it opened against; repoints affect the
    NEXT open, exactly like the generation pointer)."""
    from .reader import IndexReader

    return IndexReader(spark, resolve(store_dir, name))
