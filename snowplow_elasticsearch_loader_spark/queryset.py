"""Reference query set (FIXTURES.md §2): fixed, deterministic, used by
the entry contract, the pytest suite, and bench.py.

Mix per the fixture spec: single rare term, single hot term, multi-term
conjunctions, casing variants, absent term (empty result), and a
duplicate-term query. Vocabulary matches the driver's synthetic
``documents`` table at every scale factor.
"""

from __future__ import annotations

REFERENCE_QUERIES: list[tuple[str, str]] = [
    ("q-0001", "merge sort window"),
    ("q-0002", "the"),  # hot term (skew probe)
    ("q-0003", "vector"),
    ("q-0004", "spark batch spark"),  # duplicate term -> qtf=2
    ("q-0005", "customer filter group order"),
    ("q-0006", "zzzz notindexed"),  # absent -> empty result
    ("q-0007", "Hash JOIN"),  # casing variants
    ("q-0008", "dup scan stream"),
]

DEFAULT_K = 10


def queries_sql_values(queries: list[tuple[str, str]] | None = None) -> str:
    """Render the query set as a SQL VALUES list (shared by oracles)."""
    qs = REFERENCE_QUERIES if queries is None else queries
    rows = ", ".join("('{}', '{}')".format(qid, text.replace("'", "''")) for qid, text in qs)
    return f"(VALUES {rows}) AS q(query_id, query_text)"
