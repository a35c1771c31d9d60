"""Relational + extension operators (SURVEY §2).

Each operator is a pure ``DataFrame -> DataFrame`` function. The query
registry (plans/queries.py) binds them to the fixture tables and pairs
each with a DuckDB oracle SQL string for the driver's correctness gate.
"""
