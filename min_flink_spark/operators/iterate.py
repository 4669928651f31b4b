"""Generic fixed-point iteration — the IterativeStream capability.

The reference family's iterative dataflow (DataStream.iterate in full
Flink; absent from the trim, implied by capability parity) maps onto a
driver-side loop over DataFrames, and doing that loop NAIVELY is the
classic Spark iterative-algorithm trap: each round's plan nests the
previous round's, so round k compiles an O(k)-deep lineage and round
20 takes minutes to even plan. This helper owns the discipline that
makes iteration scale (the same one operators/graph.py proved out):

- ``localCheckpoint(eager=True)`` after every step — truncates lineage
  so every round plans O(1) work;
- superseded rounds' blocks are unpersisted — at most two state copies
  live at any time, regardless of max_iter;
- only the convergence flag (a 1-row count) crosses to the driver —
  never the data.

Convergence default: the step reached a fixed point when the new state
has no row outside the old state (multiset compare via exceptAll,
short-circuited by limit(1)) — pass ``changed`` for a cheaper
domain-specific test (e.g. a flag column count).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from min_flink_spark.core.ckpt import unpersist_checkpoint


def iterate_fixed_point(
    initial: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int = 50,
    changed: Callable[[DataFrame, DataFrame], bool] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Apply ``step`` repeatedly until a fixed point (or ``max_iter``).

    ``step`` must be a pure function of its input state DataFrame and
    return a DataFrame with the SAME schema. With ``strict`` (default)
    non-convergence raises instead of returning a silently unfinished
    state."""
    state = initial.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        new = step(state).localCheckpoint(eager=True)
        if changed is not None:
            did_change = changed(state, new)
        else:
            did_change = new.exceptAll(state).limit(1).count() > 0
        # Dataset.unpersist() is a no-op for localCheckpointed frames
        # on Spark 4.1.2 — free the superseded checkpoint RDD directly
        unpersist_checkpoint(state)
        state = new
        if not did_change:
            converged = True
            break
    if strict and not converged:
        raise RuntimeError(
            f"iterate_fixed_point did not converge within {max_iter} rounds; "
            "raise max_iter or pass strict=False"
        )
    return state
