"""Pipeline observability: metric accounting as a side effect of the
job itself (``df.observe``), not a second pass.

A 100 TB curation run must report how many rows each gate dropped —
recomputing those counts with separate ``count()`` jobs doubles the
scan cost. ``observe`` attaches named aggregates to a point in the
plan; they are computed during the one real execution (map-side, no
extra shuffle for sums/counts) and surface on the driver via
``Observation.get`` (batch) or each micro-batch's
``progress.observedMetrics`` (streaming).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str,
             metrics: dict[str, Column]) -> tuple[DataFrame,
                                                  Observation | None]:
    """Attach named metric aggregates at this point of the plan.

    Batch: returns the (unchanged-semantics) DataFrame and an
    Observation — read ``obs.get`` after the FIRST action on the
    returned frame. Streaming: Spark forbids Observation objects there
    (metrics arrive per micro-batch), so the node is registered by name
    and the returned Observation is None — read
    ``query.lastProgress['observedMetrics'][name]`` per micro-batch.
    """
    exprs = [c.alias(n) for n, c in metrics.items()]
    if df.isStreaming:
        return df.observe(name, *exprs), None
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def funnel(stages: list[tuple[str, DataFrame]],
           count_expr: Column) -> tuple[list[DataFrame], list[Observation]]:
    """Instrument a filter funnel: one observation per stage, so one
    job reports row counts at every gate (rows-in minus rows-out per
    stage is the drop accounting a curation pipeline publishes)."""
    out_frames, out_obs = [], []
    for name, df in stages:
        f, o = observed(df, name, {"n_rows": count_expr})
        out_frames.append(f)
        out_obs.append(o)
    return out_frames, out_obs
