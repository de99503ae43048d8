from .analyze import TOKEN_PATTERN, tokens_col, duckdb_tokens_expr  # noqa: F401
