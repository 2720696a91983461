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
