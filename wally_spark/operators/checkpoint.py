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


def pin(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool | None = None,
) -> DataFrame:
    """Truncate ``df``'s lineage and arrange for one-shot
    materialization — reliably when a checkpoint dir is configured
    (see module docstring), else in executor storage via
    localCheckpoint.

    The local checkpoint is EAGER by default. A lazy variant
    (``spark.wally.pin.eager=false``) was A/B-measured in r13: it won
    2-15% on lanes whose pins sit above shuffles (AQE materializes
    those stages at ``toRdd`` time anyway, so laziness only skips the
    final block-write job), but lost 40-80% on lanes whose pinned plan
    has NO shuffle at the top (broadcast-join dwj in the BPE layout,
    the banded LSH relation in contrastive_pairs): there nothing
    materializes at pin time and every consumer recomputes the guarded
    plan — exactly the multi-consumer recompute pin() exists to
    prevent. Eager is the safe default; the conf knob remains for
    per-session experiments.

    The ``eager`` parameter (r14) lets a call site override the
    session default for pins that are KNOWN to sit directly above a
    shuffle: AQE materializes the shuffle stages at toRdd time even
    for a lazy localCheckpoint, so laziness skips only the final
    block-write job (a pure fixed cost locally) while the truncated
    lineage still protects every consumer from recomputing the plan
    below the exchange. Leave it None (session default, eager) for
    any pin whose plan top is NOT a shuffle — r13 measured 40-80%
    losses there under lazy pinning.

    Determinism contract: every pinned lineage in this repo is a pure
    function of its inputs (md5-derived sampling, no rand)."""
    spark = df.sparkSession
    d = resolve_checkpoint_dir(spark, checkpoint_dir)
    if d:
        spark.sparkContext.setCheckpointDir(d)
        return df.checkpoint()
    if eager is None:
        eager = (
            str(spark.conf.get("spark.wally.pin.eager", "true")).lower()
            != "false"
        )
    return df.localCheckpoint(eager=eager)


def pin_shuffle_top(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """``pin`` for plans whose TOP is an exchange-fed aggregate /
    window (r14): AQE materializes the shuffle stages at toRdd time
    even for a lazy localCheckpoint, so the eager final block-write
    job is a pure fixed cost — lazy skips it while the truncated
    lineage still guards every consumer, and the only recomputable
    part is the cheap post-shuffle map. Measured on the minhash
    sigs/cands pins: the eager job was most of the BUILD time of the
    audit lanes (see OPTIMIZATION_r14.md).

    Use ONLY where the pinned plan top sits directly above its own
    exchange; for shuffle-free tops lazy pinning loses 40-80% (r13
    A/B) — keep plain pin() there. NEVER pass one of these frames to
    ``free_blocks`` (unpersisting a lazy pin strands consumers).

    A/B knob: spark.wally.pin.lazyshuffletop=false restores eager."""
    lazy = (
        str(
            df.sparkSession.conf.get(
                "spark.wally.pin.lazyshuffletop", "true"
            )
        ).lower()
        != "false"
    )
    return pin(df, checkpoint_dir, eager=not lazy)


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
            spark = df.sparkSession
            # Lazy-pin sessions (spark.wally.pin.eager=false): the
            # frame's blocks are read by the FINAL consumer action,
            # which runs AFTER the loop-body free_blocks call —
            # unpersisting here strands that action ("checkpoint block
            # rdd_N not found", reproduced at sf0.1 in r13). Under
            # lazy pinning the whole call is therefore a no-op and the
            # ContextCleaner reclaims blocks when the Python-side
            # references die (the documented best-effort fallback).
            eager = (
                str(
                    spark.conf.get("spark.wally.pin.eager", "true")
                ).lower()
                != "false"
            )
            if not eager:
                continue
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
