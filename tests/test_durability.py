"""The DURABILITY.md contract: single-writer lock, stale-lock stealing,
crash-between-write-and-commit resume (see also test_resume_idempotent)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from engine import synth
from engine.index_build import LOCK_NAME, build_index


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("dcorpus") / "pages.parquet"
    synth.write_pages(str(p), 400)
    return str(p)


def test_concurrent_build_rejected(spark, corpus, tmp_path_factory):
    """While another process HOLDS the flock, a second build is rejected."""
    import fcntl

    out = str(tmp_path_factory.mktemp("dur1") / "idx")
    os.makedirs(out)
    lock = os.path.join(out, LOCK_NAME)
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    os.write(fd, json.dumps({"job_id": "other-build", "pid": os.getpid()}).encode())
    try:
        with pytest.raises(RuntimeError, match="concurrent build rejected"):
            build_index(spark, corpus, out, n_shards=2, n_buckets=4)
        # the holder's lock is untouched by the rejected attempt
        assert os.path.exists(lock)
    finally:
        os.close(fd)


def test_stale_lock_from_crashed_build_released(spark, corpus, tmp_path_factory):
    """A lock FILE without a held flock (crashed builder: the kernel
    released its flock when the process died) does not block a new build
    — no pid probing, no steal race."""
    out = str(tmp_path_factory.mktemp("dur2") / "idx")
    os.makedirs(out)
    with open(os.path.join(out, LOCK_NAME), "w") as f:
        json.dump({"job_id": "crashed-build", "pid": 99999999}, f)
    manifest = build_index(spark, corpus, out, n_shards=2, n_buckets=4)
    assert manifest["n_docs"] > 0
    assert not os.path.exists(os.path.join(out, LOCK_NAME))  # released


def test_lock_released_on_failure(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dur3") / "idx")
    with pytest.raises(Exception):
        build_index(spark, "/nonexistent/pages.parquet", out, n_shards=2, n_buckets=4)
    assert not os.path.exists(os.path.join(out, LOCK_NAME))


def test_crash_between_write_and_commit(spark, corpus, tmp_path_factory):
    """A stage dir fully written but NOT committed (no checkpoint line) is
    wiped and re-run on resume; the rebuilt index is logically identical
    (deterministic re-execution, DURABILITY.md section 2)."""
    base = str(tmp_path_factory.mktemp("dur4"))
    ref, out = os.path.join(base, "ref"), os.path.join(base, "idx")
    build_index(spark, corpus, ref, n_shards=2, n_buckets=4, bucket_chunk=2)
    build_index(spark, corpus, out, n_shards=2, n_buckets=4, bucket_chunk=2, job_id="j1")

    # simulate the crash window: postings bucket=1 data is on disk but its
    # commit line is removed (write completed, commit never happened)
    ckpt = os.path.join(out, "checkpoint.jsonl")
    with open(ckpt) as f:
        lines = [ln for ln in f if ln.strip()]
    victims = {"postings:bucket=1", "term_stats"}
    with open(ckpt, "w") as f:
        for ln in lines:
            if json.loads(ln)["stage"] not in victims:
                f.write(ln)
    assert os.path.isdir(os.path.join(out, "postings", "bucket=1"))

    build_index(
        spark, corpus, out, n_shards=2, n_buckets=4, bucket_chunk=2,
        job_id="j2", resume=True,
    )
    for sub in ["postings", "docmap", "term_stats"]:
        a = spark.read.parquet(os.path.join(ref, sub))
        b = spark.read.parquet(os.path.join(out, sub))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, sub
    shutil.rmtree(base)
