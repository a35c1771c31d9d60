"""Query registry: every operator bound to the fixture tables, paired
with its DuckDB oracle SQL (SURVEY §5.2)."""

from .queries import QUERIES, QuerySpec  # noqa: F401
