"""Layer-A parity pipeline: validate -> enrich -> transform -> side-outputs.

The reference's per-batch loop (companybindex/main.go:128-279) re-expressed
as one declarative DataFrame plan:

- validation filters + reject side-channel: transform/transform.go:37-45,
  write/write.go:8-16 (five error files -> one reject DataFrame w/ reason)
- alphakey enrichment: the batched HTTP zip-by-ordinal join
  (main.go:226-259, eshttp/eshttp.go:78-102) replaced by the deterministic
  in-process vectorized UDF (SURVEY.md 7.3) — no join needed at all
- document transform: transform/transform.go:36-73 field by field
  (kind/links.self/record_type constants, name split T1, sort-key concat)

Input schema: (id string, company_name string nullable, company_number,
company_status, company_type string) — the flattened MongoCompany.  A
`companies_from_documents` helper derives a deterministic company-shaped
table from the driver's documents parquet for tests and oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.textnorm import alphakey_col, split_company_name_endings_col

KIND = "searchresults#company"  # transform.go:12
RECORD_TYPE = "companies"  # transform.go:64


def validate_companies(companies: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P2/P3 filters with the reference's reject reasons (transform.go:37-45).

    Returns (valid, rejects(id, reason)). `company_name IS NULL` models the
    Go `Data == nil` case (missing-data), empty string the missing-name case.
    """
    rejects = companies.select(
        "id",
        F.when(F.col("company_name").isNull(), F.lit("missing_data"))
        .when(F.col("company_name") == "", F.lit("missing_name"))
        .alias("reason"),
    ).filter(F.col("reason").isNotNull())
    valid = companies.filter(
        F.col("company_name").isNotNull() & (F.col("company_name") != "")
    )
    return valid, rejects


def transform_companies(companies: DataFrame) -> DataFrame:
    """The EsCompany document (datastructures/elastic.go:4-28) as a nested
    DataFrame: enrichment + split + struct assembly in one plan."""
    valid, _ = validate_companies(companies)
    d = valid.withColumn("sp", split_company_name_endings_col(F.col("company_name")))
    d = d.withColumn("ak", alphakey_col(F.col("company_name")))
    return d.select(
        F.col("id").alias("ID"),
        F.col("company_type"),
        F.lit(KIND).alias("kind"),
        F.struct(F.format_string("/company/%s", F.col("id")).alias("self")).alias("links"),
        F.concat_ws(":", F.col("ak.ordered_alpha_key"), F.col("id")).alias(
            "ordered_alpha_key_with_id"
        ),
        F.struct(
            F.col("company_number"),
            F.col("company_status"),
            F.col("company_name").alias("corporate_name"),
            F.col("sp.name_start").alias("corporate_name_start"),
            F.col("sp.name_ending").alias("corporate_name_ending"),
            F.lit(RECORD_TYPE).alias("record_type"),
            F.col("ak.same_as_alpha_key").alias("alpha_key"),
            F.col("ak.ordered_alpha_key").alias("ordered_alpha_key"),
        ).alias("items"),
    )


def export_es_bulk(transformed: DataFrame) -> DataFrame:
    """T7 parity (companybindex/main.go:263-270): the ES bulk-NDJSON
    serialization — per company an action line {"index":{"_id":...}} and
    the EsCompany source doc as compact JSON. SURVEY 2.3 declares the JSON
    wire format obsolete for the columnar sink; this closes the export
    path anyway (write with .write.text for literal bulk files). Spark's
    to_json and DuckDB's to_json(struct_pack(...)) are byte-identical on
    these docs (no nulls, field order preserved), so the driver oracle
    hash-matches the exact serialized bytes."""
    return transformed.select(
        F.col("ID").alias("id"),
        F.to_json(
            F.struct(F.struct(F.col("ID").alias("_id")).alias("index"))
        ).alias("action_json"),
        F.to_json(
            F.struct(
                "ID", "company_type", "kind", "links",
                "ordered_alpha_key_with_id", "items",
            )
        ).alias("doc_json"),
    )


def companies_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic company-shaped table derived from the driver's
    documents parquet (same name synthesis as __spark_entry__): exercises
    nulls (doc_id % 97 == 0 -> NULL name) and empties (% 89 == 0)."""
    name = F.concat(
        F.upper(F.col("source")),
        F.element_at(
            F.array(
                F.lit(" LIMITED"), F.lit(" LLP."), F.lit(" UNLIMITED"),
                F.lit(""), F.lit(" L.T.D..."),
            ),
            (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"),
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.when(F.pmod(F.col("doc_id"), F.lit(97)) == 0, F.lit(None))
        .when(F.pmod(F.col("doc_id"), F.lit(89)) == 0, F.lit(""))
        .otherwise(name)
        .alias("company_name"),
        F.format_string("%08d", F.col("doc_id")).alias("company_number"),
        F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0, F.lit("dissolved"))
        .otherwise(F.lit("active"))
        .alias("company_status"),
        F.lit("ltd").alias("company_type"),
    )
