"""Bin-packing statistics over bounded length histograms.

Best-fit-decreasing (BFD) is inherently sequential per item, which
would be a driver loop over the corpus — a scale-killer. The exact
same packing is computable from the (length, count) HISTOGRAM of item
lengths, which is bounded by the bin capacity (lengths live in
[1, capacity]) regardless of corpus size: same-length items are
interchangeable, and best-fit placement of a run of equal-length items
cascades deterministically through the capacity classes. This module
holds that bulk algorithm; the collect() here is the documented
bounded-relation kind (<= capacity rows), the same contract as
operators/kmeans' centroids.

Equivalence to item-sequential BFD (tested property-based against a
naive per-item simulator): processing lengths descending, the best-fit
target is the smallest remaining capacity c >= l. A bin drawn from
class c absorbs floor(c / l) consecutive items of length l — after
each placement the bin's remainder c - j*l is strictly the new minimum
fitting capacity until it drops below l — and ends in class c mod l
(< l, never a candidate again for this length). So a run of n items
consumes whole bins from class c in bulk, then (possibly) one partial
bin, then moves to the next class; opening fresh bins is the same
cascade with c = capacity and unlimited supply.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame

__all__ = ["bestfit_pack_histogram", "bestfit_pack_stats"]


def bestfit_pack_histogram(
    hist: list[tuple[int, int]], capacity: int
) -> tuple[int, int]:
    """Exact BFD over a (length, count) histogram; lengths must lie in
    [1, capacity]. Returns (n_bins, padding_tokens)."""
    state: Counter = Counter()  # remaining capacity -> open bins
    n_bins = 0
    for length, n in sorted(hist, reverse=True):
        if not 1 <= length <= capacity:
            raise ValueError(f"item length {length} outside [1, {capacity}]")
        n = int(n)
        while n > 0:
            fits = [c for c in state if c >= length]
            if fits:
                c = min(fits)
                supply = state[c]
            else:
                c, supply = capacity, None  # open fresh bins as needed
            per = c // length  # items one bin absorbs via the cascade
            if supply is not None and n >= supply * per:
                # the whole class drains: every bin ends at c mod l
                state[c % length] += supply
                del state[c]
                n -= supply * per
                continue
            full, leftover = divmod(n, per)
            used = full + (1 if leftover else 0)
            if supply is None:
                n_bins += used
            else:
                state[c] -= used
                if not state[c]:
                    del state[c]
            state[c % length] += full
            if leftover:
                state[c - leftover * length] += 1
            n = 0
    padding = sum(c * cnt for c, cnt in state.items())
    return n_bins, padding


def bestfit_pack_stats(
    hist_df: DataFrame, capacity: int
) -> tuple[int, int]:
    """Collect the BOUNDED (length, count) histogram (<= capacity
    rows by construction — the caller groups item lengths modulo the
    capacity) and run the bulk BFD. First column = length, second =
    count."""
    rows = hist_df.collect()
    return bestfit_pack_histogram(
        [(int(r[0]), int(r[1])) for r in rows], capacity
    )
