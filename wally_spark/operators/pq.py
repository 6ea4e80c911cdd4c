"""Product-quantization machinery (codebook training + encode/ADC
UDFs) shared by plans/similarity.ann_pq.

Training holds ONLY the (PQ_SUB, PQ_K, PQ_SUBDIM) codebook tensor on
the driver — the same bounded-state contract as operators/kmeans.py —
over a deterministic md5-nibble ¼ sample, so results replicate in SQL
(plans/similarity._pq_oracle)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PQ_SUB = 8       # subspaces
PQ_SUBDIM = 8    # dims per subspace (8 x 8 = 64)
PQ_K = 16        # centroids per subspace codebook
PQ_ITERS = 2
PQ_CAND = 50     # ADC candidates per query before exact re-rank

_PQ_SAMPLE_NIBBLES = ("0", "1", "2", "3")  # md5 1/4 training sample


def pq_sampled(col):
    return F.substring(F.md5(col.cast("string")), 1, 1).isin(*_PQ_SAMPLE_NIBBLES)


def pq_codebooks(emb: DataFrame):
    """Train the (PQ_SUB, PQ_K, PQ_SUBDIM) codebook tensor:
    deterministic Lloyd's rounds over a deterministic md5-nibble ¼
    SAMPLE of the corpus (codebooks converge with corpus size — the
    training pass must not scan 100 TB). ALL subspaces train together:
    each round is ONE Arrow encode pass + ONE posexplode aggregation
    whose map-side combine ships PQ_SUB×PQ_K×PQ_SUBDIM partial sums per
    task (vs. a per-subspace k-means loop = 8× the jobs for identical
    math). Driver state is the codebook tensor only."""
    import numpy as np

    sample = emb.where(pq_sampled(F.col("vec_id"))).select("vec_id", "embedding")
    init = np.array(
        [r["embedding"] for r in sample.orderBy("vec_id").limit(PQ_K).collect()],
        dtype=np.float64,
    )  # (PQ_K, 64) — the same k-lowest-ids init every subspace uses
    if len(init) == 0:
        # empty-input short-circuit: no sampled vectors (empty corpus
        # slice) trains an all-zero codebook; downstream encode/ADC
        # UDFs never see a row, so the result is empty rather than a
        # dead job. 0 < n < PQ_K stays a loud error.
        return np.zeros((PQ_SUB, PQ_K, PQ_SUBDIM))
    if len(init) < PQ_K:
        raise ValueError(f"PQ needs {PQ_K} sampled vectors, got {len(init)}")
    cbs = init.reshape(PQ_K, PQ_SUB, PQ_SUBDIM).transpose(1, 0, 2).copy()
    for _ in range(PQ_ITERS):
        coded = sample.select(
            "vec_id",
            pq_encode_udf(cbs)(F.col("embedding")).alias("codes"),
            "embedding",
        )
        upd = (
            coded.select("codes", F.posexplode("embedding").alias("j", "x"))
            .select(
                F.floor(F.col("j") / PQ_SUBDIM).cast("int").alias("s"),
                (F.col("j") % PQ_SUBDIM).alias("p"),
                F.element_at(
                    "codes", (F.floor(F.col("j") / PQ_SUBDIM) + 1).cast("int")
                ).alias("cluster"),
                F.col("x").cast("double").alias("x"),
            )
            .groupBy("s", "cluster", "p")
            .agg(F.avg("x").alias("m"))
            .collect()  # PQ_SUB × PQ_K × PQ_SUBDIM means — bounded
        )
        nxt = cbs.copy()  # empty cells keep their old centroid
        for r in upd:
            nxt[r["s"], r["cluster"], r["p"]] = r["m"]
        cbs = nxt
    return cbs  # (PQ_SUB, PQ_K, PQ_SUBDIM)


def pq_encode_udf(cbs):
    """array<float> embedding -> array<int> of PQ_SUB codes, one numpy
    argmin per Arrow batch (ties -> lowest code, same as the SQL
    row_number tie-break)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType

    cb = cbs.copy()

    def encode(e):
        if not len(e):
            return pd.Series([], dtype=object)
        m = np.array(e.tolist(), dtype=np.float64)  # (n, 64)
        msub = m.reshape(len(m), PQ_SUB, PQ_SUBDIM)
        codes = np.empty((len(m), PQ_SUB), dtype=np.int32)
        for s in range(PQ_SUB):
            d = ((msub[:, s, None, :] - cb[s]) ** 2).sum(-1)  # (n, PQ_K)
            codes[:, s] = d.argmin(1)
        return pd.Series(list(codes))

    return F.pandas_udf(encode, ArrayType(IntegerType()))


def pq_adc_udf(cbs):
    """(query embedding, corpus codes) -> asymmetric-distance (ADC)
    squared distance through the codebook."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType

    cb = cbs.copy()

    def adc(qe, codes):
        if not len(qe):
            return pd.Series([], dtype="float64")
        q = np.array(qe.tolist(), dtype=np.float64).reshape(
            len(qe), PQ_SUB, PQ_SUBDIM
        )
        c = np.array(codes.tolist(), dtype=np.int64)  # (n, PQ_SUB)
        recon = cb[np.arange(PQ_SUB)[None, :], c]  # (n, PQ_SUB, PQ_SUBDIM)
        return pd.Series(((q - recon) ** 2).sum((1, 2)))

    return F.pandas_udf(adc, DoubleType())
