"""ES pipeline aggregations over a parent aggregation's bucket table.

ES evaluates pipeline aggs in the coordinating node's REDUCE phase, over
the already-combined bucket list — never over raw documents. The Spark
twin keeps that cost model: every function here is a DataFrame plan over
the parent's combined bucket table (search_aggs output), so the input is
bounded by the parent's bucket count (histogram bins / terms size), not
the corpus. At 100 TB the parent agg does the heavy matched-set work;
these plans are window/aggregate ops over at most a few thousand rows —
and because they stay DataFrame ops (not driver-side lists) they compose
with the oracle gate (every one is plain ANSI SQL: window sum, lag,
order+limit, aggregate).

Parent-agg contract (matches engine.aggs combine schemas):
- histogram      -> (bucket double, doc_count)        ordered by bucket
- date_histogram -> (bucket timestamp, doc_count)     ordered by bucket
- terms          -> (key string, doc_count)           doc_count desc

`path` follows ES buckets_path: "_count" means the parent's doc_count
column; any other value names a metric column present on the bucket
table (e.g. v_sum from a stats sub-agg).

Sequential pipeline aggs (cumulative_sum / derivative) require the
parent's bucket-key column for ordering — ES restricts these to
histogram parents for the same reason (buckets must form a sequence).

Reference parity note: the reference loader delegates every aggregation
to Elasticsearch verbatim (it ships documents; Kibana/ES run the aggs),
so pipeline semantics here follow the public ES documentation.
"""

from __future__ import annotations

import ast

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _metric(path: str) -> str:
    return "doc_count" if path == "_count" else path


def cumulative_sum(
    buckets: DataFrame, path: str, order_col: str, out: str = "cumulative_sum"
) -> DataFrame:
    """ES `cumulative_sum`: running sum of `path` in bucket-key order."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return buckets.withColumn(
        out, F.sum(F.col(_metric(path)).cast("double")).over(w)
    ).orderBy(order_col)


def derivative(
    buckets: DataFrame, path: str, order_col: str, out: str = "derivative"
) -> DataFrame:
    """ES `derivative`: first-difference of `path` in bucket-key order.
    The first bucket has no derivative (null), as in ES."""
    w = Window.orderBy(order_col)
    m = F.col(_metric(path)).cast("double")
    return buckets.withColumn(out, m - F.lag(m).over(w)).orderBy(order_col)


def bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, bool]] | None = None,
    size: int | None = None,
    frm: int = 0,
) -> DataFrame:
    """ES `bucket_sort`: reorder/truncate the parent's buckets.
    sort = [(column, ascending), ...]; size/from page the sorted list.
    With no sort, keeps the parent's order (ES: sort-less bucket_sort
    is just a truncation)."""
    out = buckets
    if sort:
        out = out.orderBy(
            *[F.asc(c) if asc else F.desc(c) for c, asc in sort]
        )
    if frm:
        out = out.offset(frm)
    if size is not None:
        out = out.limit(size)
    return out


def sibling_bucket(buckets: DataFrame, path: str, op: str) -> DataFrame:
    """ES `avg_bucket` / `sum_bucket` / `min_bucket` / `max_bucket` /
    `stats_bucket`: one row aggregating `path` across the parent's
    buckets (the sibling-pipeline family)."""
    m = F.col(_metric(path)).cast("double")
    if op == "stats":
        return buckets.agg(
            F.count(m).alias("count"),
            F.min(m).alias("min"),
            F.max(m).alias("max"),
            F.sum(m).alias("sum"),
            F.avg(m).alias("avg"),
        )
    fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[op]
    return buckets.agg(fn(m).alias("value"))


# --- bucket_script / bucket_selector: a tiny arithmetic expression
# compiler (ES uses Painless; the subset every pipeline script in the
# wild actually uses is arithmetic over params + comparisons) ---

_BIN = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: a % b,
}
_CMP = {
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


def compile_script(script: str, params: dict[str, str]):
    """Compile an ES pipeline-script expression to a Spark Column.
    `params` maps script variable names to bucket-table columns
    (buckets_path entries, `_count` resolved). Supports arithmetic
    (+ - * / %), unary minus, comparisons, and/or, parentheses, and
    numeric literals — a whitelisted AST walk, nothing else evaluates."""

    def walk(node):
        if isinstance(node, ast.Expression):
            return walk(node.body)
        if isinstance(node, ast.BinOp) and type(node.op) in _BIN:
            return _BIN[type(node.op)](walk(node.left), walk(node.right))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -walk(node.operand)
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = type(node.ops[0])
            if op in _CMP:
                return _CMP[op](walk(node.left), walk(node.comparators[0]))
        if isinstance(node, ast.BoolOp):
            cols = [walk(v) for v in node.values]
            acc = cols[0]
            for c in cols[1:]:
                acc = acc & c if isinstance(node.op, ast.And) else acc | c
            return acc
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return F.lit(node.value)
        if isinstance(node, ast.Name):
            if node.id not in params:
                raise ValueError(f"unknown script param {node.id!r}")
            return F.col(_metric(params[node.id])).cast("double")
        raise ValueError(
            f"unsupported script construct {ast.dump(node)[:80]} "
            "(arithmetic/comparison subset only)"
        )

    # ES spells params "params.x"; accept both by stripping the prefix
    return walk(ast.parse(script.replace("params.", ""), mode="eval"))


def bucket_script(
    buckets: DataFrame, params: dict[str, str], script: str, out: str
) -> DataFrame:
    """ES `bucket_script`: per-bucket computed metric column."""
    return buckets.withColumn(out, compile_script(script, params))


def bucket_selector(
    buckets: DataFrame, params: dict[str, str], script: str
) -> DataFrame:
    """ES `bucket_selector`: keep buckets where the script is true."""
    return buckets.filter(compile_script(script, params))


def moving_fn(
    buckets: DataFrame,
    path: str,
    order_col: str,
    window: int,
    fn: str = "avg",
    out: str = "moving_fn",
) -> DataFrame:
    """ES `moving_fn` (the MovingFunctions builtins subset: unweightedAvg
    / sum / min / max): sliding-window aggregate of `path` in bucket-key
    order. ES window semantics: the window covers the PREVIOUS `window`
    buckets EXCLUDING the current one (shift=0 default), and the first
    bucket — whose window is empty — yields null."""
    w = (
        Window.orderBy(order_col).rowsBetween(-window, -1)
    )
    m = F.col(_metric(path)).cast("double")
    agg = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[fn]
    return buckets.withColumn(out, agg(m).over(w)).orderBy(order_col)


def serial_diff(
    buckets: DataFrame,
    path: str,
    order_col: str,
    lag: int = 1,
    out: str = "serial_diff",
) -> DataFrame:
    """ES `serial_diff`: value minus the value `lag` buckets earlier in
    bucket-key order; the first `lag` buckets yield null (as in ES)."""
    w = Window.orderBy(order_col)
    m = F.col(_metric(path)).cast("double")
    return buckets.withColumn(out, m - F.lag(m, lag).over(w)).orderBy(order_col)


def percentiles_bucket(
    buckets: DataFrame, path: str, percents: tuple = (25.0, 50.0, 75.0)
) -> DataFrame:
    """ES `percentiles_bucket`: sibling pipeline — exact interpolated
    percentiles of `path` across the parent's buckets (percentile_cont,
    the same exactness divergence from ES's nearest-rank-on-sorted-list
    as the document-level percentiles agg... ES percentiles_bucket is
    itself exact but uses nearest-rank; linear interpolation is this
    engine's frozen definition, shared with PercentilesAgg and the
    DuckDB quantile_cont oracle)."""
    m = F.col(_metric(path)).cast("double")
    fracs = ", ".join(f"{p / 100.0!r}" for p in percents)
    col = _metric(path)
    q = buckets.select(m.alias(col)).agg(
        F.expr(f"percentile({col}, array({fracs}))").alias("q")
    )
    names = ["p" + f"{p:g}".replace(".", "_") for p in percents]
    return q.select(*[F.col("q")[i].alias(n) for i, n in enumerate(names)])
