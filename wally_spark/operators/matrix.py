"""Bounded-relation → numpy matrix collection for broadcast probes.

The plans/ package is under an AST gate banning driver-side
materialization (tests/test_plans.py::test_no_driver_collect_in_plans)
because an unbounded collect() is an OOM at the 100 TB target. The
collects that ARE legitimate — relations bounded by construction
(eval-suite holdouts, probe query sets, centroids, codebooks) — live
in operators/, where each call site documents its bound. This module
is the one place a plan may turn such a relation into a broadcastable
numpy matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_id_matrix(df: DataFrame, id_col: str, vec_col: str):
    """(ids, float64 matrix) of a BOUNDED (id, vector) relation,
    sorted by id — id order is the tiebreak contract for numpy
    first-max argmax probes (decontaminate_embedding,
    embedding_matryoshka_recall). The caller owns the boundedness
    argument: holdout/query/probe sets whose size is fixed by the
    problem (an eval suite, a probe panel), never by the corpus."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).collect()
    ids = [int(r[id_col]) for r in rows]
    if not rows:
        # keep the matrix 2-D so axis-1 norms/products at plan
        # construction survive an empty relation (empty-corpus sweep)
        return ids, np.zeros((0, 0), dtype=np.float64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return ids, mat


def collect_rows(df: DataFrame, max_rows: int) -> list:
    """Collect a BOUNDED relation's rows to the driver — the sanctioned
    route for plans that re-enter a tiny computed relation into later
    plan text as LITERALS (iterative-training winners, bucket cuts).
    The caller owns the boundedness argument (document it at the call
    site); the bound is enforced, not hinted: more than ``max_rows``
    rows raises instead of silently ballooning driver state."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"collect_rows: relation exceeded its documented bound "
            f"({len(rows)} > {max_rows} rows)"
        )
    return rows
