"""Z-order layout: multi-dimensional row-group pruning, measured from
the parquet footers the files actually carry (pyarrow), not from a
claim. A selective predicate on EITHER interleaved column must skip
most files in the z-ordered layout; a single-column sort gives pruning
only on the sorted column."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from tests.conftest import SF_SMALL
from wally_spark.operators.layout import write_zordered
from wally_spark.tables import load_tables

N_FILES = 16


def _file_ranges(path, col):
    """(min, max) of ``col`` per parquet file under ``path``."""
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        if los:
            out.append((min(los), max(his)))
    return out


def _hit_fraction(ranges, lo, hi):
    hits = [1 for a, b in ranges if not (b < lo or a > hi)]
    return len(hits) / max(len(ranges), 1)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(ev, ["user_id", "value"], zpath, n_files=N_FILES)
    # contrast layout: range-sorted by user_id only
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    stats = ev.agg(
        {"user_id": "max", "value": "max"}
    ).collect()[0]
    u_hi, v_hi = stats["max(user_id)"], stats["max(value)"]

    # a ~10%-wide band on each dimension
    z_user = _hit_fraction(_file_ranges(zpath, "user_id"), 0, u_hi * 0.1)
    z_value = _hit_fraction(_file_ranges(zpath, "value"), 0, v_hi * 0.1)
    s_user = _hit_fraction(_file_ranges(spath, "user_id"), 0, u_hi * 0.1)
    s_value = _hit_fraction(_file_ranges(spath, "value"), 0, v_hi * 0.1)

    # single-column sort: perfect on its column, useless on the other
    assert s_user <= 3 / N_FILES
    assert s_value == 1.0
    # z-order: substantial pruning on BOTH dimensions
    assert z_user <= 0.5, z_user
    assert z_value <= 0.5, z_value
    # and no rows were lost
    assert spark.read.parquet(zpath).count() == ev.count()
