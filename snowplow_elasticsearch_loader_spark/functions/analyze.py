"""Text analysis: the tokenizer contract (SURVEY E1).

The reference delegates analysis to the Elasticsearch ``standard``
analyzer (implicit in every indexed text field; unicode round-trip is
asserted in the reference via app_id="my-app-üöä",
modules/it/aws/.../it/EnrichedSpec.scala:36). Our contract: Unicode
word segmentation approximated by runs of letters/digits
(``[\\p{L}\\p{N}]+``) over the lowercased text.

Two implementations, one contract:

- ``tokens_col``: pure Spark built-ins (``lower`` + ``regexp_extract_all``)
  — JVM-side, inside whole-stage codegen; this is the hot path.
- ``tokenize_series``: a vectorized pandas implementation of the SAME
  pattern, used inside Arrow UDF stages (SPIMI build, oracle) so every
  layer of the system agrees on analysis byte-for-byte.

``duckdb_tokens_expr`` renders the same analysis as DuckDB SQL so the
driver's oracle compares against an independent engine running the
identical contract (RE2 and Java regex agree on \\p{L}/\\p{N} classes).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Unicode runs of letters/digits; identical semantics in Java regex
#: (Spark), RE2 (DuckDB), and Python `regex`-free re (with re.UNICODE).
TOKEN_PATTERN = r"[\p{L}\p{N}]+"

#: Python's `re` lacks \p classes; [^\W_] == letters+digits under
#: re.UNICODE, matching \p{L}\p{N} for the BMP vocab we handle.
_PY_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokens_col(text: Column | str) -> Column:
    """ArrayType(StringType) of analyzed tokens — JVM-side, codegen-able."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized pandas twin of tokens_col (for Arrow UDF stages/oracle)."""
    return texts.fillna("").str.lower().str.findall(_PY_TOKEN_RE)


def tokenize_text(text: str) -> list[str]:
    return _PY_TOKEN_RE.findall((text or "").lower())


def duckdb_tokens_expr(col: str = "text") -> str:
    """DuckDB SQL expression producing the same token array."""
    return f"regexp_extract_all(lower({col}), '[\\p{{L}}\\p{{N}}]+')"


def tokenize_arrow(texts: pd.Series):
    """Zero-python-object tokenizer for Arrow-UDF hot paths.

    Same contract as tokens_col/tokenize_series — runs of \\p{L}\\p{N}
    over the lowercased text, realized as a split on the complement
    class — but executed entirely in Arrow C++ (RE2): lower, split,
    flatten, drop empty edge pieces. Returns ``(row_of, tokens)`` where
    ``tokens`` is a flat pyarrow StringArray of every token instance in
    row order and ``row_of`` is the int64 row index of each token. No
    per-token Python object is ever created; downstream term-code
    assignment uses Arrow dictionary_encode (C++ hash) so millions of
    postings never materialize Python strings.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(texts.fillna(""))
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), r"[^\p{L}\p{N}]+")
    flat_all = lists.flatten()
    row_of = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat_all, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    return row_of[keep_np], flat_all.filter(keep)
