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
