"""Emulate the driver's correctness gate: run every __spark_entry__ query
on Spark AND its oracle SQL on DuckDB at the given sf dir; compare row
count, column names, and the order-insensitive multiset of values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from engine.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: floats to a fixed repr
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_key(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(tuple(norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows())
    return cols, rows


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SELF_ARTIFACT = os.path.join(REPO, "CORRECTNESS_SELF.json")


def _latest_driver_artifact() -> str | None:
    import glob

    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    return files[-1] if files else None


def _check_artifact_coverage(qnames: set[str]) -> None:
    """Guard (VERDICT r2 #1): the newest driver correctness artifact must
    cover exactly the queries() set — otherwise the repo's green claim is
    not self-certifying. A full check_entry run writes CORRECTNESS_SELF
    as the up-to-date self-certification; this warns loudly either way."""
    import json as _json

    latest = _latest_driver_artifact()
    if latest is None:
        print("NOTE: no driver CORRECTNESS_r*.json present")
        return
    with open(latest) as f:
        have = set(_json.load(f).keys())
    missing = sorted(qnames - have)
    extra = sorted(have - qnames)
    if missing or extra:
        print(
            f"WARNING: {os.path.basename(latest)} is STALE vs queries(): "
            f"missing={missing} extra={extra} — CORRECTNESS_SELF.json "
            "(written by this full run) is the current self-certification"
        )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL: unknown query names {sorted(unknown)}")
        return 2
    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()

        def rec(rows_m, schema_m, hash_m, s_rows, o_rows, err=None):
            results[name] = {
                "rows_match": rows_m,
                "schema_match": schema_m,
                "hash_match": hash_m,
                "spark_rows": s_rows,
                "oracle_rows": o_rows,
                "err": err,
            }

        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec(False, False, False, None, None, f"spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            rec(None, None, None, len(sdf), None, "rows-only: no oracle by design")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            rec(False, False, False, len(sdf), None, f"duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        scols, srows = frame_key(sdf)
        ocols, orows = frame_key(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} duck={ocols}")
            rec(len(srows) == len(orows), False, False, len(srows), len(orows))
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(orows)}")
            rec(False, True, False, len(srows), len(orows))
            n_fail += 1
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL  {name}: {len(diffs)} differing rows of {len(srows)}")
            for a, b in diffs[:3]:
                print(f"      spark={a}\n      duck ={b}")
            rec(True, True, False, len(srows), len(orows))
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        rec(True, True, True, len(srows), len(orows))
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if not only:
        import json as _json

        with open(SELF_ARTIFACT, "w") as f:
            _json.dump({"sf_dir": sf_dir, "results": results}, f, indent=2)
        print(f"wrote {SELF_ARTIFACT} ({len(results)} queries)")
        _check_artifact_coverage(set(qs))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
