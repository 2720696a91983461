"""CLI surface smoke: build-index (with --progress ticker), query, and
export-json run end-to-end as real subprocesses (the spark-submit shape)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_MASTER="local[4]")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli.py"), *args],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from engine import synth

    p = tmp_path_factory.mktemp("clicorpus") / "pages.parquet"
    synth.write_pages(str(p), 300)
    return str(p)


def test_cli_build_query_roundtrip(corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cliidx") / "idx")
    r = _run("build-index", "--input", corpus, "--output", idx,
             "--shards", "2", "--buckets", "4", "--progress")
    assert r.returncode == 0, r.stderr[-2000:]
    built = json.loads(r.stdout.strip().splitlines()[-1])
    assert built["built"]["n_docs"] > 250
    assert "[tick]" in r.stderr  # the --progress ticker emitted lines

    r = _run("query", "--index", idx, "--terms", "the data", "--k", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < len(out["hits"]) <= 5
    scores = [h["score"] for h in out["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_ingest_merge_query_roundtrip(corpus, tmp_path_factory):
    """Incremental lifecycle as subprocesses: two ingest-segment appends,
    merge-segments into the standard layout, then a bool-mode query
    against the merged index (must term honored in every hit)."""
    inc = str(tmp_path_factory.mktemp("cliinc") / "inc")
    ingested = 0
    for expected_seg in (0, 1):
        r = _run("ingest-segment", "--input", corpus, "--dir", inc,
                 "--shards", "2", "--buckets", "4")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["seg_id"] == expected_seg
        assert out["segments"] == expected_seg + 1
        ingested = out["n_docs"]
    assert ingested > 500  # 2 x ~300-doc segments minus validation rejects
    r = _run("merge-segments", "--dir", inc, "--shards", "2", "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    merged = json.loads(r.stdout.strip().splitlines()[-1])
    assert merged["n_docs"] == ingested

    r = _run("query", "--index", inc, "--mode", "bool",
             "--must", "the", "--should", "data fast", "--must-not", "slow",
             "--k", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < len(out["hits"]) <= 5
    scores = [h["score"] for h in out["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_delete_compact_roundtrip(corpus, tmp_path_factory):
    """Delete lifecycle as subprocesses: tombstone the top hit, see it
    vanish from queries, compact, query the compacted index."""
    idx = str(tmp_path_factory.mktemp("clidel") / "idx")
    r = _run("build-index", "--input", corpus, "--output", idx,
             "--shards", "2", "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("query", "--index", idx, "--terms", "the data", "--k", "3")
    hits = json.loads(r.stdout.strip().splitlines()[-1])["hits"]
    victim = hits[0]["url"]

    r = _run("delete-docs", "--index", idx, "--urls", victim)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["tombstoned"] == 1

    r = _run("query", "--index", idx, "--terms", "the data", "--k", "3")
    hits2 = json.loads(r.stdout.strip().splitlines()[-1])["hits"]
    assert victim not in {h["url"] for h in hits2}

    out = str(tmp_path_factory.mktemp("clicompact") / "idx")
    r = _run("compact", "--index", idx, "--output", out)
    assert r.returncode == 0, r.stderr[-2000:]
    compacted = json.loads(r.stdout.strip().splitlines()[-1])
    assert compacted["n_docs"] > 0

    r = _run("query", "--index", out, "--terms", "the data", "--k", "3")
    hits3 = json.loads(r.stdout.strip().splitlines()[-1])["hits"]
    assert hits3 and victim not in {h["url"] for h in hits3}


def test_cli_export_json(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("cliexp") / "bulk")
    r = _run("export-json", "--input", "/root/testdata/sf0.001/documents.parquet",
             "--output", out_dir)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = []
    for root, _, files in os.walk(out_dir):
        for fn in files:
            if fn.startswith("part-"):
                with open(os.path.join(root, fn)) as f:
                    lines.extend(ln for ln in f.read().splitlines() if ln)
    assert lines and len(lines) % 2 == 0  # action/doc pairs
    act, doc = json.loads(lines[0]), json.loads(lines[1])
    assert "index" in act and "_id" in act["index"]
    assert doc["ID"] == act["index"]["_id"]


def test_cli_search_surface(corpus, tmp_path_factory):
    """count / agg / suggest / explain / mlt subcommands end-to-end on a
    docvalued index built via the CLI."""
    idx = str(tmp_path_factory.mktemp("clisurf") / "idx")
    r = _run("build-index", "--input", corpus, "--output", idx,
             "--shards", "2", "--buckets", "4", "--docvalues", "lang")
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("count", "--index", idx, "--terms", "if line")
    assert r.returncode == 0, r.stderr[-2000:]
    n_or = json.loads(r.stdout.strip().splitlines()[-1])["count"]
    assert n_or > 0

    r = _run("agg", "--index", idx, "--type", "terms", "--field", "lang",
             "--terms", "if line")
    assert r.returncode == 0, r.stderr[-2000:]
    buckets = json.loads(r.stdout.strip().splitlines()[-1])["buckets"]
    assert sum(b["doc_count"] for b in buckets) == n_or

    r = _run("suggest", "--index", idx, "--term", "lne")
    assert r.returncode == 0, r.stderr[-2000:]
    sugg = json.loads(r.stdout.strip().splitlines()[-1])["suggestions"]
    assert sugg and all(s["distance"] <= 2 for s in sugg)
    keys = [(s["distance"], -s["df"], s["suggestion"]) for s in sugg]
    assert keys == sorted(keys)  # (distance asc, df desc, term asc) order

    r = _run("query", "--index", idx, "--terms", "if line", "--k", "1")
    hit = json.loads(r.stdout.strip().splitlines()[-1])["hits"][0]
    r = _run("explain", "--index", idx, "--terms", "if line",
             "--url", hit["url"])
    assert r.returncode == 0, r.stderr[-2000:]
    exp = json.loads(r.stdout.strip().splitlines()[-1])["terms"]
    assert exp and abs(sum(t["contribution"] for t in exp) - hit["score"]) < 1e-4

    r = _run("mlt", "--index", idx, "--like",
             "if line table row the and scan", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["hits"]


def test_cli_swap_and_upsert(corpus, tmp_path_factory):
    """swap-index: build aside + atomic publish over an existing live dir;
    upsert: replace-by-url into a new index — both as real subprocesses."""
    work = tmp_path_factory.mktemp("cliswap")
    live = str(work / "live")
    r = _run("swap-index", "--input", corpus, "--live", live,
             "--shards", "2", "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_docs"] > 250 and os.path.isdir(live)
    # second swap replaces in place; no .next/.old residue
    r = _run("swap-index", "--input", corpus, "--live", live,
             "--shards", "2", "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert not os.path.exists(live + ".next") and not os.path.exists(live + ".old")
    r = _run("query", "--index", live, "--terms", "the data", "--k", "3")
    assert r.returncode == 0 and json.loads(r.stdout.strip().splitlines()[-1])["hits"]

    # upsert: replace one url's text, then the new content must be findable
    import pyarrow as pa
    import pyarrow.parquet as pq

    batch = str(work / "batch.parquet")
    pq.write_table(
        pa.table({
            "url": ["https://upserted.example/new"],
            "text": ["xylophone quartz unique replacement tokens"],
        }),
        batch,
    )
    up = str(work / "upserted")
    r = _run("upsert", "--index", live, "--input", batch, "--output", up)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_docs"] == out["n_docs"] + 1
    r = _run("query", "--index", up, "--terms", "xylophone quartz", "--k", "3")
    hits = json.loads(r.stdout.strip().splitlines()[-1])["hits"]
    assert [h["url"] for h in hits] == ["https://upserted.example/new"]


def test_cli_search_dsl(corpus, tmp_path_factory):
    """ES _search JSON body through the CLI: hits + aggregations come back
    ES-shaped from a real subprocess."""
    idx = str(tmp_path_factory.mktemp("clidsl") / "idx")
    r = _run("build-index", "--input", corpus, "--output", idx,
             "--shards", "2", "--buckets", "4", "--docvalues", "lang")
    assert r.returncode == 0, r.stderr[-2000:]
    body = json.dumps({
        "query": {"match": {"text": "the data"}},
        "size": 5,
        "aggs": {"langs": {"terms": {"field": "lang", "size": 3}}},
        "track_total_hits": True,
    })
    r = _run("search", "--index", idx, "--body", body)
    assert r.returncode == 0, r.stderr[-2000:]
    resp = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < len(resp["hits"]["hits"]) <= 5
    assert resp["hits"]["total"]["value"] >= len(resp["hits"]["hits"])
    assert resp["aggregations"]["langs"]["buckets"]


def test_cli_rank_eval(corpus, tmp_path_factory):
    """ES _rank_eval through the CLI: a graded request comes back with the
    overall metric_score and per-request details from a real subprocess."""
    idx = str(tmp_path_factory.mktemp("clirev") / "idx")
    r = _run("build-index", "--input", corpus, "--output", idx,
             "--shards", "2", "--buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    # discover a real hit id first, then rate it relevant
    r = _run("search", "--index", idx, "--body",
             json.dumps({"query": {"match": {"text": "the data"}}, "size": 1}))
    assert r.returncode == 0, r.stderr[-2000:]
    top = json.loads(r.stdout.strip().splitlines()[-1])["hits"]["hits"][0]["_id"]
    body = json.dumps({
        "requests": [{
            "id": "q1",
            "request": {"query": {"match": {"text": "the data"}}},
            "ratings": [{"_id": top, "rating": 1}],
        }],
        "metric": {"mean_reciprocal_rank": {"k": 5}},
    })
    r = _run("rank-eval", "--index", idx, "--body", body)
    assert r.returncode == 0, r.stderr[-2000:]
    resp = json.loads(r.stdout.strip().splitlines()[-1])
    assert resp["metric_score"] == 1.0  # top hit rated relevant -> MRR 1
    assert resp["details"]["q1"]["hits"][0]["hit"]["_id"] == top
    assert not resp["failures"]
