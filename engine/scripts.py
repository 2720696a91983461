"""ES `script_score` (frozen subset): a safe, vectorized score-expression
compiler.

The reference delegates scoring entirely to Elasticsearch, where
script_score runs Painless over `_score` and doc values. This engine
freezes the useful, SQL-expressible core of that surface instead of
shipping an interpreter:

- grammar: Python expression syntax over `_score`, `doc['field'].value`,
  numeric literals, `+ - * / **`, unary minus, and the function
  whitelist `log`, `log1p`, `sqrt`, `abs`, `saturation(v, pivot)`
  (= v / (v + pivot)), `sigmoid(v, k, a)` (= v^a / (k^a + v^a)) — the
  same function set ES documents for script_score;
- compilation: Python `ast` parse + strict node whitelist (no names
  other than `_score`/`doc`, no calls outside the table, no attributes
  except `.value` on a doc subscript) -> a closure evaluated with numpy
  on whole candidate arrays, never per row;
- null docvalues evaluate as 0.0 (frozen; Painless would throw — a
  pipeline over 10^12 docs wants total functions);
- the compiled script REPLACES the BM25 score (ES script_score
  semantics). Replaced totals are unrelated to the stored block-max
  bounds, so the query path drops to the exact TAAT kernel, scoring
  every matched doc before the top-k cut — same exactness rule as
  function_score / stats_override (engine/query.py).

Every construct here is deterministic and mirrors a plain SQL
expression, so the DuckDB oracle can replay scripts verbatim.
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "log": np.log,
    "log1p": np.log1p,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "saturation": lambda v, pivot: v / (v + pivot),
    "sigmoid": lambda v, k, a: v**a / (k**a + v**a),
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Pow: np.power,
}


def compile_score_script(source: str):
    """source -> (fields, fn) where `fields` is the list of doc fields the
    script reads and `fn(scores, cols)` evaluates it vectorized over the
    candidate arrays (`cols` maps field -> float64 array, nulls already
    0.0). Raises ValueError on anything outside the frozen grammar."""
    try:
        tree = ast.parse(source.strip(), mode="eval")
    except SyntaxError as e:
        raise ValueError(f"script_score parse error: {e}") from None
    fields: list[str] = []

    def build(node):
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric literal {node.value!r}")
            v = float(node.value)
            return lambda s, c: v
        if isinstance(node, ast.Name):
            if node.id != "_score":
                raise ValueError(f"unknown name {node.id!r} (only _score)")
            return lambda s, c: s
        if isinstance(node, ast.Attribute):
            # doc['field'].value
            if node.attr != "value" or not isinstance(node.value, ast.Subscript):
                raise ValueError("attributes must be doc['field'].value")
            sub = node.value
            if not (
                isinstance(sub.value, ast.Name) and sub.value.id == "doc"
                and isinstance(sub.slice, ast.Constant)
                and isinstance(sub.slice.value, str)
            ):
                raise ValueError("subscripts must be doc['field'].value")
            fld = sub.slice.value
            if fld not in fields:
                fields.append(fld)
            return lambda s, c, f=fld: c[f]
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            inner = build(node.operand)
            return lambda s, c: -inner(s, c)
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            op = _BINOPS[type(node.op)]
            left, right = build(node.left), build(node.right)
            return lambda s, c: op(left(s, c), right(s, c))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(
                    f"unknown function (whitelist: {sorted(_FUNCS)})"
                )
            if node.keywords:
                raise ValueError("keyword arguments are not supported")
            fn = _FUNCS[node.func.id]
            args = [build(a) for a in node.args]
            return lambda s, c: fn(*[a(s, c) for a in args])
        raise ValueError(f"unsupported syntax: {ast.dump(node)[:60]}")

    fn = build(tree)
    return fields, fn


def compile_runtime_script(source: str):
    """ES runtime fields (`runtime_mappings`): the same frozen grammar as
    script_score MINUS `_score` (a runtime field is a per-document value,
    defined before any query scores exist), compiled to BOTH execution
    targets from one AST walk:

    - a vectorized numpy closure `np_fn(cols) -> float64 array` for the
      shard-kernel paths (gathered docvalue arrays, nulls already 0.0);
    - a Catalyst Column closure `col_fn() -> pyspark Column` for pure
      DataFrame plans (match_all sort over the docmap) — the expression
      stays JVM-side in whole-stage codegen; null docvalues coalesce to
      0.0 so both targets agree bit-for-bit on the same rows.

    Returns (fields, np_fn, col_fn). The two targets are built from the
    same parse so they cannot drift (equivalence is property-tested)."""
    from pyspark.sql import functions as F

    try:
        tree = ast.parse(source.strip(), mode="eval")
    except SyntaxError as e:
        raise ValueError(f"runtime script parse error: {e}") from None
    fields: list[str] = []

    _COL_FUNCS = {
        "log": F.log,
        "log1p": lambda c: F.log1p(c),
        "sqrt": F.sqrt,
        "abs": F.abs,
        "saturation": lambda v, p: v / (v + p),
        "sigmoid": lambda v, k, a: F.pow(v, a) / (F.pow(k, a) + F.pow(v, a)),
    }
    _COL_BINOPS = {
        ast.Add: lambda a, b: a + b,
        ast.Sub: lambda a, b: a - b,
        ast.Mult: lambda a, b: a * b,
        ast.Div: lambda a, b: a / b,
        ast.Pow: F.pow,
    }

    def build(node):
        """-> (np_closure(cols), col_closure()) pair for this node."""
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric literal {node.value!r}")
            v = float(node.value)
            return (lambda c: v), (lambda: F.lit(v))
        if isinstance(node, ast.Name):
            raise ValueError(
                f"unknown name {node.id!r} (runtime fields have no _score)"
            )
        if isinstance(node, ast.Attribute):
            if node.attr != "value" or not isinstance(node.value, ast.Subscript):
                raise ValueError("attributes must be doc['field'].value")
            sub = node.value
            if not (
                isinstance(sub.value, ast.Name) and sub.value.id == "doc"
                and isinstance(sub.slice, ast.Constant)
                and isinstance(sub.slice.value, str)
            ):
                raise ValueError("subscripts must be doc['field'].value")
            fld = sub.slice.value
            if fld not in fields:
                fields.append(fld)
            return (
                lambda c, f=fld: c[f],
                lambda f=fld: F.coalesce(F.col(f).cast("double"), F.lit(0.0)),
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            n_i, c_i = build(node.operand)
            return (lambda c: -n_i(c)), (lambda: -c_i())
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            np_op = _BINOPS[type(node.op)]
            col_op = _COL_BINOPS[type(node.op)]
            nl, cl = build(node.left)
            nr, cr = build(node.right)
            return (
                lambda c: np_op(nl(c), nr(c)),
                lambda: col_op(cl(), cr()),
            )
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(
                    f"unknown function (whitelist: {sorted(_FUNCS)})"
                )
            if node.keywords:
                raise ValueError("keyword arguments are not supported")
            np_fn_, col_fn_ = _FUNCS[node.func.id], _COL_FUNCS[node.func.id]
            pairs = [build(a) for a in node.args]
            return (
                lambda c: np_fn_(*[p[0](c) for p in pairs]),
                lambda: col_fn_(*[p[1]() for p in pairs]),
            )
        raise ValueError(f"unsupported syntax: {ast.dump(node)[:60]}")

    np_body, col_body = build(tree)
    return (
        fields,
        lambda cols: np.asarray(np_body(cols), dtype=np.float64),
        col_body,
    )


def build_shard_script(reader, source: str):
    """(shard, sorted_local_ids, scores) -> replaced scores for the query
    kernels — the script_score analog of build_shard_boost: the same
    candidates-only docvalue gather, then one vectorized evaluation."""
    from engine.docvalues import gather_docvalues

    fields, fn = compile_score_script(source)
    dv_cols = reader.manifest.get("docvalue_cols") or []
    missing = [f for f in fields if f not in dv_cols]
    if missing:
        raise ValueError(
            f"script field(s) {missing} not in index docvalues {dv_cols}"
        )
    index_dir = reader.dir

    def shard_script(
        shard: int, local_ids: np.ndarray, scores: np.ndarray
    ) -> np.ndarray:
        cols = {}
        if fields:
            tbl = gather_docvalues(index_dir, int(shard), fields, local_ids)
            for f in fields:
                cols[f] = np.nan_to_num(
                    tbl.column(f)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64),
                    nan=0.0,
                )
        return np.asarray(fn(scores, cols), dtype=np.float64)

    return shard_script
