"""Declared query plans (SURVEY.md §2.4 + §2.5) and their oracle SQL."""

from .relational import ORACLE, QUERIES  # noqa: F401
from . import extensions  # noqa: F401  (registers into QUERIES/ORACLE)
from . import relational2  # noqa: F401  (registers into QUERIES/ORACLE)
