"""Query registry: every operator bound to the fixture tables, paired
with its DuckDB oracle SQL (SURVEY §5.2).

Module naming note (VERDICT r9 nit): ``roundN.py`` numbers QUERY
BATCHES in the order they were added, NOT build rounds — several
batches land per build round (e.g. round10.py..round22.py are all
build rounds 5-9; round23.py is build round 10). The authoritative
name→batch mapping is simply the ``QUERIES.update(...)`` order at the
bottom of ``queries.py``."""

from .queries import QUERIES, QuerySpec  # noqa: F401
