"""Declared query plans (SURVEY.md §2.4) and their oracle SQL."""

from .relational import ORACLE, QUERIES  # noqa: F401
