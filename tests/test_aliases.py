"""Index aliases (engine/aliases.py): atomic repoint, filtered aliases
composing the native filter context, one-rename action batches, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from engine.aliases import (
    alias_actions,
    alias_delete,
    alias_list,
    alias_put,
    alias_resolve,
    open_alias,
)
from engine.index_build import build_index
from engine.query import bm25_topk

from tests.conftest import SF001

Q = ["hash", "join"]


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    """Two physical indexes over disjoint halves of the corpus — the
    blue/green pair an alias repoints between."""
    base = tmp_path_factory.mktemp("aliasidx")
    d = spark.read.parquet(os.path.join(SF001, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("url"),
        "text", "lang", "n_chars",
    )
    dirs = []
    for i, pred in enumerate(
        [F.col("url").cast("long") % 2 == 0, F.col("url").cast("long") % 2 == 1]
    ):
        out = str(base / f"idx{i}")
        build_index(
            spark, d.filter(pred), out, n_shards=2, n_buckets=4,
            docvalue_cols=["lang", "n_chars"],
        )
        dirs.append(out)
    return dirs


def test_alias_atomic_repoint(spark, two_indexes, tmp_path):
    reg = str(tmp_path / "aliases.json")
    blue, green = two_indexes
    alias_put(reg, "live", blue)
    r1, f1 = open_alias(spark, reg, "live")
    assert r1.dir == os.path.abspath(blue) and f1 == ()
    blue_top = [x["url"] for x in bm25_topk(r1, Q, k=5).collect()]
    # atomic remove+add repoint (the ES _aliases contract)
    alias_actions(reg, [
        {"remove": {"alias": "live"}},
        {"add": {"alias": "live", "index": green}},
    ])
    # the already-open reader keeps serving its pinned directory
    assert [x["url"] for x in bm25_topk(r1, Q, k=5).collect()] == blue_top
    # a fresh open sees the new target, and the result set changed
    r2, _ = open_alias(spark, reg, "live")
    assert r2.dir == os.path.abspath(green)
    green_top = [x["url"] for x in bm25_topk(r2, Q, k=5).collect()]
    assert green_top != blue_top
    assert all(int(u) % 2 == 1 for u in green_top)
    with pytest.raises(KeyError):
        alias_resolve(reg, "nope")
    alias_delete(reg, "live")
    assert alias_list(reg) == {}


def test_filtered_alias_composes_filter_context(spark, two_indexes, tmp_path):
    from engine.aggs import TermsAgg, search_aggs
    from engine.docvalues import TermFilter

    reg = str(tmp_path / "aliases.json")
    blue, _green = two_indexes
    alias_put(
        reg, "en-only", blue,
        filters=[{"term": {"lang": "en"}}],
    )
    r, filters = open_alias(spark, reg, "en-only")
    assert filters == (TermFilter("lang", "en"),)
    native = bm25_topk(r, Q, k=10, filters=(TermFilter("lang", "en"),))
    via_alias = bm25_topk(r, Q, k=10, filters=filters)
    assert [tuple(x) for x in via_alias.collect()] == [
        tuple(x) for x in native.collect()
    ]
    buckets = search_aggs(r, Q, TermsAgg("lang", 10), filters=filters).collect()
    assert [b["key"] for b in buckets] == ["en"]
    # a non-index target is rejected
    with pytest.raises(ValueError, match="not a built index"):
        alias_put(reg, "bad", str(tmp_path))


def test_alias_cli_smoke(two_indexes, tmp_path):
    reg = str(tmp_path / "aliases.json")
    blue, green = two_indexes
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def cli(*args):
        p = subprocess.run(
            [sys.executable, os.path.join(root, "cli.py"), *args],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert p.returncode == 0, p.stderr
        return json.loads(p.stdout.strip().splitlines()[-1])

    assert cli("alias", "add", "--registry", reg, "--alias", "live",
               "--index", blue)["added"] == "live"
    assert cli("alias", "resolve", "--registry", reg, "--alias", "live")[
        "index"
    ] == os.path.abspath(blue)
    assert cli("alias", "add", "--registry", reg, "--alias", "live",
               "--index", green)["added"] == "live"
    listing = cli("alias", "list", "--registry", reg)
    assert listing["live"]["index"] == os.path.abspath(green)
    assert cli("alias", "remove", "--registry", reg, "--alias", "live")[
        "removed"
    ] == "live"
