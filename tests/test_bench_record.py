"""bench.py record protocol (VERDICT r13 #2).

The printed line must carry THIS RUN's values; the min-merge across
sweeps lives only in BENCH_FULL.json and is keyed on (sf, cpus) so a
run at a different core count or scale factor never merges into (or
inherits from) another environment's record.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import update_record


def test_same_env_merges_by_min():
    recs, merged, sweeps = update_record(None, {"a": 2.0, "b": 3.0}, 0.1, 32)
    assert sweeps == 1 and merged == {"a": 2.0, "b": 3.0}
    prev = {"records": recs}
    recs2, merged2, sweeps2 = update_record(prev, {"a": 1.5, "b": 3.5}, 0.1, 32)
    assert sweeps2 == 2
    assert merged2 == {"a": 1.5, "b": 3.0}


def test_different_cpus_do_not_merge():
    recs, _, _ = update_record(None, {"a": 2.0}, 0.1, 32)
    prev = {"records": recs}
    recs2, merged2, sweeps2 = update_record(prev, {"a": 9.0}, 0.1, 8)
    # 8-core sweep starts its own record; the 32-core record is intact
    assert sweeps2 == 1 and merged2 == {"a": 9.0}
    assert recs2["sf=0.1,cpus=32"]["queries"] == {"a": 2.0}
    assert recs2["sf=0.1,cpus=8"]["queries"] == {"a": 9.0}


def test_different_sf_does_not_merge():
    recs, _, _ = update_record(None, {"a": 2.0}, 0.1, 32)
    _, merged2, sweeps2 = update_record({"records": recs}, {"a": 9.0}, 1.0, 32)
    assert sweeps2 == 1 and merged2 == {"a": 9.0}


def test_changed_query_set_resets():
    recs, _, _ = update_record(None, {"a": 2.0}, 0.1, 32)
    _, merged2, sweeps2 = update_record(
        {"records": recs}, {"a": 9.0, "b": 1.0}, 0.1, 32
    )
    assert sweeps2 == 1 and merged2 == {"a": 9.0, "b": 1.0}


def test_pre_r14_record_migrates_as_32core():
    prev = {"sf": 0.1, "queries": {"a": 1.0}, "sweeps": 14}
    recs, merged, sweeps = update_record(prev, {"a": 2.0}, 0.1, 32)
    assert sweeps == 15 and merged == {"a": 1.0}
    # ...but an 8-core run does NOT inherit those minimums
    recs2, merged2, sweeps2 = update_record(prev, {"a": 2.0}, 0.1, 8)
    assert sweeps2 == 1 and merged2 == {"a": 2.0}
    assert recs2["sf=0.1,cpus=32"]["queries"] == {"a": 1.0}
