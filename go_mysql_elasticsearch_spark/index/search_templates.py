"""Stored search templates — the ES indexed-template API analog
(vendored client: put_template.go:1, get_template.go:1,
delete_template.go:1; the templates live server-side — ES 2.x keeps
them in the ``.scripts`` index — and a search references them by id
with only the params inline).

Storage mirrors the alias layer (index/aliases.py): one
``search_templates.json`` per store directory, every mutation a
write-tmp-then-``os.replace`` so concurrent readers see a complete
former-or-current mapping, never a torn file. Single writer assumed;
the file is cluster metadata (bytes, not data — nothing touches
executors).

Rendering reuses the ONE mustache substitutor
(query/querystring.py render_template) so an inline template query and
a stored one cannot drift.
"""

from __future__ import annotations

import json
import os

TEMPLATE_STORE_FILE = "search_templates.json"


def _path(store_dir: str) -> str:
    return os.path.join(store_dir, TEMPLATE_STORE_FILE)


def _load(store_dir: str) -> dict[str, str]:
    p = _path(store_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _store(store_dir: str, templates: dict[str, str]) -> None:
    os.makedirs(store_dir, exist_ok=True)
    tmp = _path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(templates, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(store_dir))


def put_search_template(store_dir: str, template_id: str, source: str) -> None:
    """PUT /_search/template/{id} (put_template.go)."""
    t = _load(store_dir)
    t[template_id] = source
    _store(store_dir, t)


def get_search_template(store_dir: str, template_id: str) -> str:
    """GET /_search/template/{id} (get_template.go); KeyError if absent
    (the client's 404)."""
    t = _load(store_dir)
    if template_id not in t:
        raise KeyError(f"search template not found: {template_id!r}")
    return t[template_id]


def delete_search_template(store_dir: str, template_id: str) -> bool:
    """DELETE /_search/template/{id} (delete_template.go); returns
    whether the id existed."""
    t = _load(store_dir)
    found = template_id in t
    if found:
        del t[template_id]
        _store(store_dir, t)
    return found


def render_stored(store_dir: str, template_id: str, params: dict) -> str:
    """Resolve-by-id + render — the search-side half of the API."""
    from ..query.querystring import render_template

    return render_template(get_search_template(store_dir, template_id), params)
