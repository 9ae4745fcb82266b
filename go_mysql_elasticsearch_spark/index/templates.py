"""Index templates — settings-by-pattern at index creation (vendored
client: indices_put_template.go:1, indices_get_template.go,
indices_delete_template.go).

The reference creates ONE index per synced table
(river/river.go:82-139), so a fleet of table-indexes shares analyzer
config through templates: a template's glob pattern is matched against
the index NAME at build time and its settings merge in. Precedence is
the ES rule: defaults < templates in ascending ``order`` (higher order
wins between templates) < settings given explicitly at creation.

Storage mirrors aliases.json: one ``index_templates.json`` per store
dir, atomically replaced on every mutation. Pure driver-side metadata.
"""

from __future__ import annotations

import fnmatch
import json
import os

TEMPLATE_FILE = "index_templates.json"


def _path(store_dir: str) -> str:
    return os.path.join(store_dir, TEMPLATE_FILE)


def get_templates(store_dir: str) -> dict[str, dict]:
    p = _path(store_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def put_template(
    store_dir: str, name: str, pattern: str, settings: dict, order: int = 0
) -> dict[str, dict]:
    """indices_put_template.go: register/replace a template. ``pattern``
    is a glob over index names (``table-*``)."""
    tpls = get_templates(store_dir)
    tpls[name] = {"pattern": pattern, "settings": settings, "order": order}
    os.makedirs(store_dir, exist_ok=True)
    tmp = _path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(tpls, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(store_dir))
    return tpls


def delete_template(store_dir: str, name: str) -> dict[str, dict]:
    tpls = get_templates(store_dir)
    tpls.pop(name, None)
    tmp = _path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(tpls, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(store_dir))
    return tpls


def settings_for(
    store_dir: str, index_name: str, explicit: dict | None = None
) -> dict | None:
    """Merged settings for a new index named ``index_name``: matching
    templates apply in ascending order (ES: higher order overrides),
    explicit creation settings override everything. Returns None when
    nothing applies (caller falls through to engine defaults) — the
    result feeds ``build_index(settings=...)``, whose write_settings
    layers it over DEFAULT_SETTINGS and persists it with the index
    (K5), after which it survives compact/merge like any explicit
    settings."""
    matched = sorted(
        (t for t in get_templates(store_dir).values()
         if fnmatch.fnmatch(index_name, t["pattern"])),
        key=lambda t: t.get("order", 0),
    )
    if not matched and not explicit:
        return None
    out: dict = {}
    for t in matched:
        out.update(t["settings"])
    out.update(explicit or {})
    return out
