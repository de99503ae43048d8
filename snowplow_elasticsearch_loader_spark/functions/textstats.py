"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-side (built-in functions / SQL lambdas inside whole-stage
codegen) — no Python UDFs. Every operator here has a DuckDB twin in
contract.py built from the same expressions, so correctness is checked
against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analyze import tokens_col

#: BPE-ish pre-tokenization: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"
WS_PATTERN = r"\S+"
PUNCT_PATTERN = r"[^\s\p{L}\p{N}]"

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "is", "you", "it")),
    ("de", ("der", "die", "und", "das", "ist", "nicht", "ich")),
    ("es", ("el", "la", "que", "los", "es", "una", "por")),
    ("fr", ("le", "les", "et", "des", "est", "une", "dans")),
]


def ws_token_count(text: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(text), F.lit(WS_PATTERN), 0))


def bpe_token_count(text: str = "text") -> Column:
    return F.size(F.regexp_extract_all(F.col(text), F.lit(BPE_PATTERN), 0))


def _in_list_sql(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def quality_columns(text: str = "text", toks: Column | None = None) -> list[Column]:
    """n_chars, n_tokens, punct_ratio, stopword_ratio, avg_token_len.

    Pass ``toks`` as a BOUND pre-projected token-array column on hot
    paths: three of the five output expressions consume the token
    array, and a Project containing interpreted higher-order lambdas
    gets no codegen subexpression elimination, so an inlined tokenizer
    would run its regex once per consuming expression per row (r6)."""
    if toks is None:
        toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.size(F.regexp_extract_all(F.col(text), F.lit(PUNCT_PATTERN), 0))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    )
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct / F.nullif(n_chars, F.lit(0)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.nullif(n_tokens, F.lit(0)), 6).alias("stopword_ratio"),
        F.round(tok_chars / F.nullif(n_tokens, F.lit(0)), 6).alias("avg_token_len"),
    ]


def lang_id_col(text: str = "text", toks: Column | None = None) -> Column:
    """Stopword-profile language heuristic; ties resolve in LANG_PROFILES
    order (the DuckDB twin implements the identical CASE chain).
    ``toks``: optional bound token-array column (see quality_columns)."""
    if toks is None:
        toks = tokens_col(text)

    def _hits(words: tuple[str, ...]):
        def pred(x):
            return x.isin(*words)

        return F.size(F.filter(toks, pred))

    hits = {lang: _hits(words) for lang, words in LANG_PROFILES}
    en, de, es, fr = (hits[l] for l in ("en", "de", "es", "fr"))
    return (
        F.when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
        .when((de >= es) & (de >= fr), F.lit("de"))
        .when(es >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def fingerprint_of_norm(norm: Column) -> Column:
    """Winnowing-style rolling fingerprint over a BOUND normalized-text
    column: min md5 over all 8-char windows. ``norm`` must be a
    projected column reference — the transform lambda is interpreted,
    so an inlined tokenizer expression would re-run per window
    (project the normalization in a separate select first)."""
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - 7, F.lit(1))),
            lambda i: F.md5(F.substr(norm, i, F.lit(8)).cast("binary")),
        )
    )


def norm_text_col(text: str = "text") -> Column:
    """Analyzer-normalized text (tokens joined by space)."""
    return F.array_join(tokens_col(text), " ")


def fingerprint_col(text: str = "text") -> Column:
    """One-expression form (norm inlined into the window lambda) — kept
    for compatibility; hot paths should project ``norm_text_col`` first
    and apply ``fingerprint_of_norm``."""
    return fingerprint_of_norm(norm_text_col(text))
