"""Layer-A pipeline tests, mirroring the reference's own unit coverage
(transform/transform_test.go:35-306, format/format_test.go:9-32)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.transform import (
    companies_from_documents,
    export_es_bulk,
    transform_companies,
    validate_companies,
)


def _companies(spark):
    pdf_schema = "id string, company_name string, company_number string, company_status string, company_type string"
    import pandas as pd

    rows = [
        ("1", "TEST LIMITED", "00000001", "active", "ltd"),
        ("2", None, "00000002", "active", "ltd"),          # missing_data
        ("3", "", "00000003", "active", "ltd"),            # missing_name
        ("4", "FOO UNLIMITED", "00000004", "active", "ltd"),  # quirk: LIMITED hits first, no-space trim
        ("5", "ACME & SONS LLP.", "00000005", "active", "llp"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "company_name", "company_number", "company_status", "company_type"]),
        pdf_schema,
    )


def test_validate_reject_reasons(spark):
    _, rejects = validate_companies(_companies(spark))
    got = {(r["id"], r["reason"]) for r in rejects.collect()}
    assert got == {("2", "missing_data"), ("3", "missing_name")}


def test_transform_golden(spark):
    out = {r["ID"]: r for r in transform_companies(_companies(spark)).collect()}
    assert set(out) == {"1", "4", "5"}
    r1 = out["1"]
    # the reference's one golden case: "TEST LIMITED" -> ("TEST", " LIMITED")
    assert r1["items"]["corporate_name_start"] == "TEST"
    assert r1["items"]["corporate_name_ending"] == " LIMITED"
    assert r1["kind"] == "searchresults#company"
    assert r1["links"]["self"] == "/company/1"
    assert r1["items"]["record_type"] == "companies"
    assert r1["items"]["alpha_key"] == "TEST"
    assert r1["ordered_alpha_key_with_id"] == "TEST:1"
    # quirk: LIMITED matches before UNLIMITED, not space-preceded -> no split
    r4 = out["4"]
    assert r4["items"]["corporate_name_start"] == "FOO UNLIMITED"
    assert r4["items"]["corporate_name_ending"] == ""
    # LLP. : trailing punct stripped before match, reappears in the ending
    r5 = out["5"]
    assert r5["items"]["corporate_name_start"] == "ACME & SONS"
    assert r5["items"]["corporate_name_ending"] == " LLP."
    # frozen alphakey spec strips non-alnum ('&' vanishes; the '&'->'and'
    # char-filter belongs to the L7 analyzer only); tokens sorted+joined
    assert r5["items"]["alpha_key"] == "ACMESONS"
    assert r5["items"]["ordered_alpha_key"] == "ACMESONS"


def test_export_es_bulk_roundtrip(spark):
    """T7 (main.go:263-270): bulk NDJSON lines parse back to the EsCompany
    doc — action line carries _id, source doc carries the full struct."""
    import json

    out = {r["id"]: r for r in export_es_bulk(transform_companies(_companies(spark))).collect()}
    assert set(out) == {"1", "4", "5"}
    act = json.loads(out["1"]["action_json"])
    assert act == {"index": {"_id": "1"}}
    doc = json.loads(out["1"]["doc_json"])
    assert doc["ID"] == "1"
    assert doc["kind"] == "searchresults#company"
    assert doc["links"] == {"self": "/company/1"}
    assert doc["items"]["corporate_name"] == "TEST LIMITED"
    assert doc["items"]["corporate_name_start"] == "TEST"
    assert doc["items"]["record_type"] == "companies"
    # compact serialization, no nulls dropped surprises (all fields present)
    assert set(doc["items"]) == {
        "company_number", "company_status", "corporate_name",
        "corporate_name_start", "corporate_name_ending", "record_type",
        "alpha_key", "ordered_alpha_key",
    }


def test_companies_from_documents_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = companies_from_documents(docs)
    assert a.filter(F.col("company_name").isNull()).count() > 0
    out = transform_companies(a)
    assert out.count() == a.filter(F.col("company_name").isNotNull() & (F.col("company_name") != "")).count()
