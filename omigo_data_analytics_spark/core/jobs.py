"""Driver-job fusion helpers for iterative operators.

The iterative loops (BFS/ancestor closures, label propagation, dangling-
edge pruning) used to pay TWO driver jobs per round: an eager
localCheckpoint to materialize the round's delta, then a separate
terminator job (isEmpty / count / convergence-signature aggregate) over
the just-materialized blocks. The r14 adjudication pinned the checkpoint
itself to EAGER (a round frame is consumed by the terminator AND the next
round's plan construction — deferring its materialization makes the
consumers redo work), so the remaining fusion lever is the terminator:

``checkpoint_with_metrics`` rides the terminator aggregates on the eager
checkpoint's OWN materialization action via ``DataFrame.observe()``
(CollectMetrics accumulators fill as the checkpoint's tasks run; the
checkpoint action is wrapped in ``withAction``, so the observation
resolves the moment ``localCheckpoint()`` returns — verified: resolves in
<50 ms, including AQE empty-relation-propagated plans and calls from
worker threads). One job per round, zero extra passes over the blocks.

The observation read cannot hang: ``Observation.get`` blocks only until
the observed dataset's first action completes, and we call it strictly
AFTER the eager checkpoint (that first action) has returned. If the
checkpoint itself fails, the exception propagates before any read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.observation import Observation


def checkpoint_with_metrics(
        df: DataFrame,
        metrics: dict[str, Column]) -> tuple[DataFrame, dict]:
    """Eagerly localCheckpoint ``df`` and return ``(checkpointed_df,
    observed_metrics)`` where the metrics (a name -> aggregate-Column
    mapping, e.g. ``{"n": F.count(F.lit(1))}``) are computed BY the
    checkpoint's materialization job itself — no separate terminator job.

    Metric expressions must be deterministic aggregates over ``df``'s
    columns (the ``observe`` contract). Over an empty frame, ``count``
    metrics read 0 and value aggregates read None — same as the separate
    aggregate they replace."""
    obs = Observation()
    ck = (df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
            .localCheckpoint())
    return ck, obs.get
