"""Index aliases (ES `_aliases` API analog) — named, atomically-swappable
pointers to index directories, with optional filter clauses.

The reference's zero-downtime lifecycle (run-elastic-search.sh delete-
then-create + cli swap-index) replaces an index IN PLACE; aliases add
the other half of the ES story: callers address a NAME, and operators
repoint the name between physical indexes in one atomic action — the
standard blue/green pattern (`POST /_aliases` with remove+add executes
atomically in ES; here one registry rename is the atomicity).

Registry layout: one JSON file mapping alias -> {"index": <dir>,
"filters": [<clause dict>, ...]}. Filter clauses use the `_search` DSL's
filter-context shapes (term / range / exists over docvalues) so a
filtered alias is exactly "this index, pre-composed with these clauses"
— `open_alias` returns (IndexReader, clause tuple) and every native
operator takes the clauses via its `filters` parameter. Writes go
write-to-temp + fsync + os.rename (the same durability contract as the
index checkpoint log, DURABILITY.md); readers opened before a repoint
keep serving their old directory — the manifest-generation guard in
IndexReader already errors a reader whose own directory was swapped
under it.
"""

from __future__ import annotations

import json
import os
import tempfile


def _load(registry_path: str) -> dict:
    if not os.path.exists(registry_path):
        return {}
    with open(registry_path) as f:
        return json.load(f)


def _store(registry_path: str, reg: dict) -> None:
    d = os.path.dirname(os.path.abspath(registry_path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".aliases-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(reg, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, registry_path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def alias_actions(registry_path: str, actions: list) -> dict:
    """Apply a list of {"add": {"alias", "index", "filters"?}} /
    {"remove": {"alias"}} actions as ONE atomic registry update (the ES
    `POST /_aliases` contract: a reader never observes the intermediate
    state — remove+add repoints in a single rename). Returns the new
    registry."""
    reg = _load(registry_path)
    for a in actions:
        if "add" in a:
            spec = a["add"]
            index_dir = os.path.abspath(spec["index"])
            if not os.path.exists(os.path.join(index_dir, "MANIFEST.json")):
                raise ValueError(f"{index_dir} is not a built index")
            reg[spec["alias"]] = {
                "index": index_dir,
                "filters": list(spec.get("filters") or []),
            }
        elif "remove" in a:
            reg.pop(a["remove"]["alias"], None)
        else:
            raise ValueError(f"unknown alias action: {sorted(a)}")
    _store(registry_path, reg)
    return reg


def alias_put(registry_path: str, alias: str, index_dir: str, filters=None):
    """Create or repoint one alias (sugar over alias_actions)."""
    return alias_actions(
        registry_path,
        [{"add": {"alias": alias, "index": index_dir, "filters": filters}}],
    )


def alias_delete(registry_path: str, alias: str):
    return alias_actions(registry_path, [{"remove": {"alias": alias}}])


def alias_list(registry_path: str) -> dict:
    return _load(registry_path)


def alias_resolve(registry_path: str, alias: str) -> tuple[str, tuple]:
    """alias -> (index_dir, filter-clause tuple). The clause dicts are the
    `_search` filter-context shapes, compiled by the same parser the DSL
    uses — one clause grammar, defined once."""
    from engine.dsl import _clause_filters

    reg = _load(registry_path)
    if alias not in reg:
        raise KeyError(f"unknown alias {alias!r} in {registry_path}")
    e = reg[alias]
    return e["index"], _clause_filters(e["filters"])


def open_alias(spark, registry_path: str, alias: str):
    """(IndexReader over the alias's current target, its filter clauses).
    Pass the clauses to any operator's `filters` parameter — a filtered
    alias is a pre-composed filter context, exactly ES semantics."""
    from engine.query import IndexReader

    index_dir, filters = alias_resolve(registry_path, alias)
    return IndexReader(spark, index_dir), filters
