"""Distributed order statistics and cardinality sketches.

Two scale-path operators the 100-TB tier needs where a global
``ds.sort`` (all-to-all shuffle of every byte) would be wrong:

- ``global_quantiles``: EXACT global order statistics by iterative
  histogram selection — each pass is a streaming ``map_batches``
  partial-aggregate (256-bucket histogram per candidate interval) and
  only ever moves O(buckets × intervals) counts to the driver; the
  final exact step collects just the rows inside intervals already
  narrowed to ≤ ``collect_threshold`` values. 10^12 rows cost ~3-5
  counting passes instead of a 10^12-row shuffle.

- ``approx_distinct``: HyperLogLog register sketch (Flajolet et al.
  2007, public) as a combiner-style aggregate: per-block registers,
  elementwise-max merge, bias-corrected estimate. Distinct counts of
  ultra-high-cardinality keys without a `unique` exchange.

Both kernels are pure numpy over Arrow columns; nothing row-wise.
The reference engine needs no selection at scale (R sorts in memory,
e.g. quantile(type=7) in R/ctas.R:1262); this is its scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

__all__ = ["global_quantiles", "approx_distinct", "hll_estimate"]

_N_BUCKETS = 256


def _col_f64(t: pa.Table, col: str) -> np.ndarray:
    x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return x[~np.isnan(x)]


def global_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    *,
    collect_threshold: int = 65_536,
    max_passes: int = 64,
) -> "pd.DataFrame":  # noqa: F821
    """Exact type-7 quantiles of ``ds[col]`` (nulls dropped) without a
    global sort. Returns a small pandas frame with, per q: the two
    bracketing order statistics (exact doubles) and the interpolated
    value — matching ``quantile(type=7)`` / DuckDB's row-number walk.

    Algorithm: distributed selection. Track, per needed rank, a value
    interval known to contain it plus the count of values below the
    interval; refine with per-block histograms (one streaming pass
    refines every unfinished rank) until each interval holds few enough
    values to gather exactly.
    """
    import pandas as pd

    # pass 0: n, min, max
    def minmax(t: pa.Table) -> pa.Table:
        x = _col_f64(t, col)
        if len(x) == 0:
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "lo": pa.array([np.inf]), "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([len(x)], type=pa.int64()),
                         "lo": pa.array([float(x.min())]),
                         "hi": pa.array([float(x.max())])})

    parts = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame(
            columns=["q", "rank_lo", "rank_hi", "value_lo", "value_hi", "value"]
        )
    gmin, gmax = float(parts["lo"].min()), float(parts["hi"].max())

    # ranks needed (0-indexed order statistics): floor/ceil of q*(n-1)
    ranks = sorted({int(np.floor(q * (n - 1))) for q in qs}
                   | {int(np.ceil(q * (n - 1))) for q in qs})
    # state per rank: (lo, hi] interval; lo_count = #values <= lo;
    # in_count = #values in (lo, hi]. min handled by closed first interval.
    state = {
        r: {"lo": gmin, "hi": gmax, "lo_count": 0, "in_count": n, "first": True}
        for r in ranks
    }
    resolved: dict[int, float] = {}
    if gmin == gmax:
        resolved = {r: gmin for r in ranks}
        state = {}

    passes = 0
    while state and passes < max_passes:
        passes += 1
        active = [
            (r, s["lo"], s["hi"], s["first"])
            for r, s in state.items()
            if s["in_count"] > collect_threshold
        ]
        if not active:
            break
        # dedup identical intervals (ranks often share them early)
        intervals = sorted({(lo, hi, first) for _, lo, hi, first in active})
        edges = [
            np.linspace(lo, hi, _N_BUCKETS + 1) for lo, hi, _ in intervals
        ]

        def hist(t: pa.Table, edges=edges, intervals=intervals) -> pa.Table:
            x = _col_f64(t, col)
            rows = []
            for i, ((lo, hi, first), e) in enumerate(zip(intervals, edges)):
                if first:
                    sel = x[(x >= lo) & (x <= hi)]
                else:
                    sel = x[(x > lo) & (x <= hi)]
                # bucket b covers (e[b], e[b+1]] (first bucket closed at lo
                # when `first`): searchsorted(left) on the upper edges
                idx = np.clip(
                    np.searchsorted(e[1:], sel, side="left"), 0, _N_BUCKETS - 1
                )
                counts = np.bincount(idx, minlength=_N_BUCKETS)
                rows.append(counts)
            return pa.table(
                {
                    "iv": pa.array(
                        np.arange(len(intervals), dtype=np.int64)
                    ),
                    "counts": pa.array(list(map(list, rows)), type=pa.list_(pa.int64())),
                }
            )

        h = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        merged = {}
        for iv, counts in zip(h["iv"].to_numpy(), h["counts"]):
            c = np.asarray(counts, dtype=np.int64)
            merged[int(iv)] = merged.get(int(iv), 0) + c
        for r, lo, hi, first in active:
            i = intervals.index((lo, hi, first))
            counts = merged[i]
            e = edges[i]
            cum = np.cumsum(counts)
            s = state[r]
            # rank position inside this interval (0-indexed)
            pos = r - s["lo_count"]
            b = int(np.searchsorted(cum, pos + 1, side="left"))
            below = int(cum[b - 1]) if b > 0 else 0
            s["lo_count"] += below
            s["in_count"] = int(counts[b])
            s["lo"], s["hi"] = float(e[b]), float(e[b + 1])
            s["first"] = bool(first and b == 0)
            # degenerate interval (a mass of identical values can never
            # drop below collect_threshold): once the interval holds a
            # single representable double, the rank's value is known
            if s["hi"] == s["lo"] or (
                not s["first"] and np.nextafter(s["lo"], s["hi"]) == s["hi"]
            ):
                resolved[r] = s["hi"] if not s["first"] else s["lo"]
                del state[r]

    # exact step: gather all values inside the remaining intervals
    if state:
        fin = [(s["lo"], s["hi"], s["first"]) for s in state.values()]
        fin = sorted(set(fin))

        def gather(t: pa.Table, fin=fin) -> pa.Table:
            x = _col_f64(t, col)
            keep = np.zeros(len(x), dtype=bool)
            for lo, hi, first in fin:
                if first:
                    keep |= (x >= lo) & (x <= hi)
                else:
                    keep |= (x > lo) & (x <= hi)
            return pa.table({"v": pa.array(x[keep], type=pa.float64())})

        vals = np.sort(
            ds.map_batches(gather, batch_format="pyarrow")
            .to_pandas()["v"]
            .to_numpy()
        )
        for r, s in state.items():
            if s["first"]:
                inset = vals[(vals >= s["lo"]) & (vals <= s["hi"])]
            else:
                inset = vals[(vals > s["lo"]) & (vals <= s["hi"])]
            resolved[r] = float(inset[r - s["lo_count"]])

    out = []
    for q in qs:
        h = q * (n - 1)
        rlo, rhi = int(np.floor(h)), int(np.ceil(h))
        vlo, vhi = resolved[rlo], resolved[rhi]
        out.append(
            {
                "q": float(q),
                "rank_lo": rlo,
                "rank_hi": rhi,
                "value_lo": vlo,
                "value_hi": vhi,
                "value": vlo + (h - rlo) * (vhi - vlo),
            }
        )
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct
# ---------------------------------------------------------------------------

_HLL_SEED = np.uint64(0x9E3779B97F4A7C15)


def _hash64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) over int64/uint64
    inputs; strings are hashed via pandas' stable hasher first."""
    import pandas as pd

    if x.dtype.kind in ("i", "u"):
        h = x.astype(np.uint64)
    else:
        h = pd.util.hash_pandas_object(
            pd.Series(x), index=False, categorize=False
        ).to_numpy().astype(np.uint64)
    h = h + _HLL_SEED
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    # leading zeros of `rest` + 1 == rank
    # float64 trick is unsafe past 2^53; use bit-length via log2 on
    # the top 32 bits with integer fallback
    rank = np.zeros(len(h), dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    rank += 1
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate (Flajolet et al. 2007) with the
    small-range linear-counting correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) via an HLL sketch: one streaming
    pass of per-block registers, elementwise-max merged on the driver
    (2^p int8-sized registers — a few KB — regardless of data size)."""

    def sketch(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        regs = _hll_registers(_hash64(x), p)
        return pa.table({"regs": pa.array([regs.tolist()], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    regs = np.zeros(1 << p, dtype=np.int64)
    for r in parts["regs"]:
        regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
    return hll_estimate(regs)


def _mg_summarize(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression of an exact (item, count) frequency
    table to at most k counters: subtract the (k+1)-th largest count
    from everything, drop non-positive. The classic guarantee follows:
    every kept counter underestimates the true count by at most
    total/(k+1), and every item with true count > total/(k+1)
    survives."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(-counts, kind="mergesort")
    thresh = counts[order[k]]
    dec = counts - thresh
    keep = dec > 0
    return items[keep], dec[keep]


def heavy_hitters_mg(
    ds: rd.Dataset, col: str, *, k: int = 50, tokenize: bool = False
) -> "pd.DataFrame":  # noqa: F821
    """[graft] Misra-Gries heavy hitters over ``ds[col]`` (optionally
    whitespace-tokenized): per-block MG sketches of k counters merge by
    summation followed by one more MG compression — a mergeable,
    bounded-memory alternative to the exact top-k exchange when the
    vocabulary doesn't fit anywhere. Returns (item, mg_count) with the
    standard guarantee: mg_count in [true - 2*N/(k+1), true] after a
    two-level merge, and every item with true count > 2*N/(k+1) is
    present (pytest pins both).

    Deterministic: per-block tables are exact before compression, and
    merge order only affects which sub-threshold items drop — the kept
    counts are order-invariant because summation happens before the
    final compression."""
    import pandas as pd

    def sketch(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        if tokenize:
            toks: list[str] = []
            for s in x:
                if s is not None:
                    toks.extend(str(s).split())
            x = np.asarray(toks, dtype=object)
        else:
            # match the tokenize branch's null handling: drop nulls
            # instead of counting the literal string 'None'
            x = x[np.asarray(pd.notna(x))]
        if len(x) == 0:
            return pa.table(
                {"item": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        items, counts = np.unique(x.astype(str), return_counts=True)
        items, counts = _mg_summarize(items, counts.astype(np.int64), k)
        return pa.table(
            {"item": pa.array(items.astype(str)),
             "cnt": pa.array(counts, type=pa.int64())}
        )

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    merged = parts.groupby("item", as_index=False)["cnt"].sum()
    items, counts = _mg_summarize(
        merged["item"].to_numpy(object), merged["cnt"].to_numpy(np.int64), k
    )
    out = pd.DataFrame({"item": items.astype(str), "mg_count": counts})
    out["mg_count"] = out["mg_count"].astype(np.int64)
    return out.sort_values(
        ["mg_count", "item"], ascending=[False, True]
    ).reset_index(drop=True)


def _md5_h32(values) -> np.ndarray:
    """First 8 hex chars of md5(str(v)) as uint32 per value — the
    SQL-reproducible hash family used by the exactly-modeled sketch
    audits (mirrors DuckDB ('0x'||substr(md5(CAST(v AS VARCHAR)),1,8))).
    Integers must arrive as Python/np ints (str() gives the decimal
    form VARCHAR casts produce); strings hash as-is."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint32)
    for i, v in enumerate(values):
        s = str(int(v)) if isinstance(v, (int, np.integer)) else str(v)
        out[i] = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    return out


def hll_md5_stats(ds: rd.Dataset, col: str, *, p: int = 6) -> dict:
    """Exactly-modeled HLL audit (the md5-derandomization family that
    graduated Bloom/Count-Min in round 4): 32-bit md5 hash, bucket =
    top p bits, rank = leading-zero count of the p-shifted remainder
    (sentinel bit caps it), registers max-merged from per-block
    partials. Every output is integer-exact:

    - ``n_zero_registers``: registers still 0;
    - ``denom_e30`` = sum over registers of 2^(30 - reg) — the harmonic
      denominator scaled to an exact int64 (reg <= 33 - p <= 30);
    - ``approx_n`` = floor(7213 * m^3 * 2^30
                          / ((10000*m + 10790) * denom_e30))
      — the bias-corrected HLL estimate with alpha = 0.7213/(1+1.079/m)
      as an exact rational, evaluated in arbitrary-precision ints
      (HUGEINT on the SQL side).

    p = 6 (m = 64) keeps the audit in the pure-HLL branch for any
    column with >160 distinct values (the linear-counting branch needs
    a float ln the oracle could not reproduce bit-exactly); the
    production splitmix sketch (:func:`approx_distinct`) stays the
    scale path and is pytest-pinned separately.
    """
    import pandas as pd

    m = 1 << p

    def sketch(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        x = x[pd.notna(x)]
        h = _md5_h32(x)
        bucket = (h >> np.uint32(32 - p)).astype(np.int64)
        rest = ((h << np.uint32(p)) | np.uint32(1 << (p - 1))).astype(np.uint32)
        # rank = 32 - floor(log2(rest)): exact for 32-bit ints
        rank = (
            np.int64(32)
            - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        )
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rank)
        return pa.table({"regs": pa.array([regs.tolist()], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    regs = np.zeros(m, dtype=np.int64)
    for r in parts["regs"]:
        regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
    denom_e30 = int((np.int64(1) << (np.int64(30) - regs)).sum())
    approx_n = (7213 * m**3 * (1 << 30)) // ((10000 * m + 10790) * denom_e30)
    return {
        "n_zero_registers": int((regs == 0).sum()),
        "denom_e30": denom_e30,
        "approx_n": int(approx_n),
    }
