"""Column-level function library (JVM-side built-ins only in hot paths)."""

from .text import TOKEN_PATTERN, tokenize_col  # noqa: F401
