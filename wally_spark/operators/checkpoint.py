"""Lineage pinning for iterative and multi-consumer plans.

Plans that reference an expensive intermediate more than once (self-
joins over signatures, per-round label sets) must materialize it or
recompute it per consumer — exchange reuse is unreliable under AQE.
``pin`` is the one place that decides HOW:

- default: ``localCheckpoint`` — blocks live in executor storage.
  Right for local[n] and for short-lived intermediates, but blocks
  die with an executor, taking the (truncated) lineage with them.
- reliable: when a checkpoint directory is configured, ``checkpoint``
  writes to it (HDFS / object store) — on a real cluster a lost
  executor costs a re-read instead of a job restart. Configure per
  session via the ``spark.wally.checkpointDir`` conf or the
  ``WALLY_CHECKPOINT_DIR`` env var (conf wins), or per call site via
  the explicit argument.

``free_blocks`` releases a pinned frame's storage once no future job
will read it — iterative operators call it per round so storage stays
O(current round), not O(all rounds).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def resolve_checkpoint_dir(spark, explicit: str | None = None) -> str | None:
    """Explicit arg > spark.wally.checkpointDir conf > WALLY_CHECKPOINT_DIR
    env > None (meaning: use localCheckpoint)."""
    if explicit:
        return explicit
    conf = spark.conf.get("spark.wally.checkpointDir", None)
    if conf:
        return conf
    return os.environ.get("WALLY_CHECKPOINT_DIR") or None


def pin(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — reliably when a
    checkpoint dir is configured (see module docstring), else in
    executor storage via localCheckpoint."""
    spark = df.sparkSession
    d = resolve_checkpoint_dir(spark, checkpoint_dir)
    if d:
        spark.sparkContext.setCheckpointDir(d)
        return df.checkpoint()
    return df.localCheckpoint()


def free_blocks(*dfs: DataFrame) -> None:
    """Drop the executor-storage blocks pinning a (local)checkpointed
    DataFrame. Local checkpoints truncate lineage, so the blocks are
    the only copy — call this only once NO future job will read the
    frame. Best-effort: the analyzed plan of a checkpointed Dataset is
    a LogicalRDD whose backing RDD holds the blocks; if the py4j walk
    ever changes shape, the ContextCleaner still frees blocks on GC,
    just later. Reliable checkpoints are unaffected (their data lives
    in files)."""
    for df in dfs:
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
