"""HTML -> text extractor with a frozen, byte-identical spec.

The per-row invariant from BASELINE.json input_hint: ``extract(html) == text``
byte-identical per url for the synthetic corpus (engine/synth.py wraps `text`
in deterministic boilerplate). The spec is frozen here and golden-tested; no
locale- or library-version-dependent behavior.

Frozen spec (applied to UTF-8 decoded html):
1. take the content between the first ``<body...>`` and the last ``</body>``
   (case-insensitive); if no body tag, use the whole document
2. remove ``<script>...</script>`` and ``<style>...</style>`` blocks
   (non-greedy, case-insensitive, dotall)
3. strip all remaining tags ``<[^>]*>``
4. unescape the three core entities in this order: ``&lt;`` ``&gt;`` ``&amp;``
   (the exact inverse of ``html.escape(quote=False)``)
5. collapse whitespace runs to a single space and strip both ends

Vectorized: pandas ``.str`` ops inside an Arrow-batched pandas UDF — no
per-row Python UDFs (input_hint mandate). The reference has no extractor (its
source is pre-extracted Mongo strings); this stage is required by the
north-star input shape (html:binary alongside text:string).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BODY_RE = re.compile(r"(?is)<body[^>]*>(.*)</body>")
_SCRIPT_RE = re.compile(r"(?is)<script[^>]*>.*?</script>")
_STYLE_RE = re.compile(r"(?is)<style[^>]*>.*?</style>")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html: bytes | None) -> str | None:
    """Frozen single-value reference implementation (oracle for tests)."""
    if html is None:
        return None
    s = html.decode("utf-8")
    m = _BODY_RE.search(s)
    if m:
        s = m.group(1)
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return _WS_RE.sub(" ", s).strip()


def _extract_series(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8") if b is not None else None)
    s = s.str.extract(_BODY_RE, expand=False).fillna(s)
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_STYLE_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    s = s.str.replace("&lt;", "<", regex=False)
    s = s.str.replace("&gt;", ">", regex=False)
    s = s.str.replace("&amp;", "&", regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html)


def extract_text(html_col: Column | str) -> Column:
    """Column expression: html binary -> extracted text."""
    return extract_text_udf(F.col(html_col) if isinstance(html_col, str) else html_col)
