"""Temporal join / window operators: sessionize, as-of join, range
join, hopping-window aggregate.

These are the "custom operators Ray Data lacks" tier of the engine:
each is expressed as ONE salted hash exchange on the entity key
(``groupby(part).map_groups``) followed by a fully vectorized
numpy kernel over the whole partition — no per-group or per-row Python
dispatch, no driver-side collection. Arrow in, typed Arrow out.

Partitioning assumption (documented per the build rules): all four
operators co-locate rows by a single entity key (``user_id`` /
``conv_id``); the kernel sorts within the partition, so input block
order is irrelevant. Skewed keys are bounded by the salt only at the
granularity of whole keys — one pathological key lands on one
partition, which is the correct floor for order-dependent semantics
(the kernel itself is O(n log n) vectorized, so a hot key degrades
gracefully instead of going quadratic).

Semantics cross-checked against DuckDB (ASOF JOIN, window functions)
via the driver oracles; see ``pipelines/queries.py`` and
``__ray_entry__.oracle_sql``. The reference engine has no temporal
joins (R/ctas.R works on pre-aligned timepoints); these generalize its
timepoint alignment (R/ctas.R:589-652, rank-based) to raw event time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_SALT_BUCKETS = 64


def _salt_key(ds: rd.Dataset, key: str, buckets: int = _SALT_BUCKETS) -> rd.Dataset:
    """Add a ``part`` column = key mod buckets (int keys) so one
    exchange co-locates each entity; vectorized Arrow-native."""

    def add(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        part = (k.astype(np.int64) % np.int64(buckets)).astype(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _np(t: pa.Table, col: str) -> np.ndarray:
    return t.column(col).to_numpy(zero_copy_only=False)


def _ts_us(t: pa.Table, col: str) -> np.ndarray:
    """Timestamp column as int64 microseconds since epoch."""
    c = t.column(col)
    if pa.types.is_timestamp(c.type):
        c = c.cast(pa.timestamp("us"))
        return c.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


# ---------------------------------------------------------------------------
# Sessionization (gap-based session windows)
# ---------------------------------------------------------------------------


def sessionize(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    value: str | None = "value",
    value_scale: float = 1e6,
) -> rd.Dataset:
    """Gap-based session windows per entity: a new session starts at the
    first event of a key or when the gap to the previous event exceeds
    ``gap_us``. Emits one row per session with order-independent
    aggregates (counts, first/last timestamps, quantized value sum) so
    results are bit-exact regardless of partitioning.

    Kernel: one sort of the partition by (key, ts, tiebreak), one
    np.diff for gaps, one cumsum for session ids, reduceat aggregates.
    """

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_sessions()
        k = _np(t, key).astype(np.int64)
        tsu = _ts_us(t, ts)
        tie = _np(t, order_tiebreak).astype(np.int64)
        order = np.lexsort((tie, tsu, k))
        k, tsu = k[order], tsu[order]
        if value is not None:
            v = _np(t, value).astype(np.float64)[order]
            v_e6 = np.where(
                np.isnan(v), 0, np.floor(v * value_scale + 0.5)
            ).astype(np.int64)
            v_cnt = (~np.isnan(v)).astype(np.int64)
        else:
            v_e6 = np.zeros(len(k), dtype=np.int64)
            v_cnt = v_e6
        new_key = np.r_[True, k[1:] != k[:-1]]
        gap = np.r_[np.int64(0), tsu[1:] - tsu[:-1]]
        new_sess = new_key | (gap > np.int64(gap_us))
        starts = np.nonzero(new_sess)[0]
        ends = np.r_[starts[1:], len(k)]
        sess_of_key = np.cumsum(new_sess) - 1
        # 1-based session index within each key
        key_starts = np.nonzero(new_key)[0]
        sess_at_key_start = sess_of_key[key_starts]
        first_sess_of_key = np.repeat(
            sess_at_key_start, np.diff(np.r_[key_starts, len(k)])
        )
        sess_idx = (sess_of_key - first_sess_of_key + 1)[starts].astype(np.int64)
        n = (ends - starts).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(k[starts], type=pa.int64()),
                "session_idx": pa.array(sess_idx, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "ts_start": pa.array(tsu[starts], type=pa.timestamp("us")),
                "ts_end": pa.array(tsu[ends - 1], type=pa.timestamp("us")),
                "duration_us": pa.array(tsu[ends - 1] - tsu[starts], type=pa.int64()),
                "n_values": pa.array(np.add.reduceat(v_cnt, starts), type=pa.int64()),
                "sum_value_e6": pa.array(np.add.reduceat(v_e6, starts), type=pa.int64()),
            }
        )

    return (
        _salt_key(ds, key)
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def _empty_sessions() -> pa.Table:
    return pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "session_idx": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "ts_start": pa.array([], type=pa.timestamp("us")),
            "ts_end": pa.array([], type=pa.timestamp("us")),
            "duration_us": pa.array([], type=pa.int64()),
            "n_values": pa.array([], type=pa.int64()),
            "sum_value_e6": pa.array([], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# As-of join (latest right row at-or-before each left row, per key)
# ---------------------------------------------------------------------------


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    right_value: str = "value",
) -> rd.Dataset:
    """For each left row, attach the ``right_value`` of the newest right
    row with ``right.ts <= left.ts`` and equal ``key`` (NULL if none) —
    DuckDB ``ASOF LEFT JOIN`` semantics.

    Right rows are first collapsed to unique (key, ts) by MAX(value) so
    equal-timestamp ties are deterministic on both engines.

    One exchange: both sides are tagged and unioned, co-partitioned by
    key hash, and the kernel forward-fills the last-right-position with
    a single ``np.maximum.accumulate`` — no per-key loop, no join
    operator, no signature re-shipping.
    """

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in (key, ts, *left_cols)}
        n = t.num_rows
        cols["side"] = pa.array(np.ones(n, dtype=np.int8), type=pa.int8())
        cols["rv"] = pa.nulls(n, type=pa.float64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t.column(key), ts: t.column(ts)}
        n = t.num_rows
        for c in left_cols:
            cols[c] = pa.nulls(n, type=pa.int64())
        cols["side"] = pa.array(np.zeros(n, dtype=np.int8), type=pa.int8())
        cols["rv"] = t.column(right_value).cast(pa.float64())
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return asof_join_tagged(tagged, key=key, ts=ts, left_cols=left_cols)


def asof_join_tagged(
    tagged: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
) -> rd.Dataset:
    """As-of join over an already-tagged stream (``side`` 1 = left,
    0 = right; right rows carry ``rv``). Use this when both sides come
    from the SAME source table: one read + one tagging pass replaces
    two reads of identical bytes — at petabyte scale the read is the
    cost, not the tag."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    ts: pa.array([], type=pa.timestamp("us")),
                    **{c: pa.array([], type=pa.int64()) for c in left_cols},
                    "asof_value": pa.array([], type=pa.float64()),
                }
            )
        k = _np(t, key).astype(np.int64)
        tsu = _ts_us(t, ts)
        side = _np(t, "side").astype(np.int8)
        rv = t.column("rv").to_numpy(zero_copy_only=False).astype(np.float64)
        # collapse right dupes at (key, ts) to MAX(rv): sort so that for
        # right rows with equal (key, ts) the max rv comes LAST, then the
        # ffill below naturally picks it.
        rv_sortable = np.where(np.isnan(rv), -np.inf, rv)
        # sort: key, ts, side (right=0 before left=1 at equal ts), rv
        order = np.lexsort((rv_sortable, side, tsu, k))
        k, tsu, side = k[order], tsu[order], side[order]
        rv = rv[order]
        n = len(k)
        is_right = side == 0
        idx = np.where(is_right, np.arange(n, dtype=np.int64), np.int64(-1))
        last_right = np.maximum.accumulate(idx)
        new_key = np.r_[True, k[1:] != k[:-1]]
        key_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n, dtype=np.int64), np.int64(-1))
        )
        valid = (last_right >= key_start) & ~is_right
        out_rows = ~is_right
        matched = valid[out_rows]
        src = last_right[out_rows]
        vals = np.where(matched, rv[np.maximum(src, 0)], np.nan)
        cols: dict[str, pa.Array] = {
            key: pa.array(k[out_rows], type=pa.int64()),
            ts: pa.array(tsu[out_rows], type=pa.timestamp("us")),
        }
        for c in left_cols:
            lc = t.column(c).take(pa.array(order[out_rows]))
            cols[c] = lc.combine_chunks() if isinstance(lc, pa.ChunkedArray) else lc
        cols["asof_value"] = pa.array(vals, type=pa.float64(), from_pandas=True)
        return pa.table(cols)

    return _salt_key(tagged, key).groupby("part").map_groups(
        kernel, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Range join (aggregate right rows inside a per-left-row time window)
# ---------------------------------------------------------------------------


def range_join_count(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    window_us: int = 60 * 60 * 1_000_000,
) -> rd.Dataset:
    """For each left row, count right rows of the same key with
    ``right.ts`` in the closed interval ``[left.ts - window_us,
    left.ts]``. Returns left rows + ``n_in_window``.

    Kernel trick: instead of a per-key searchsorted loop, both interval
    boundaries become probe rows merged into the right stream; one
    lexsort + one cumsum of right-row indicators answers every count
    (count = cum[upper probe] - cum[lower probe]). Boundary ties are
    resolved by a probe-priority column so the interval is closed on
    both ends.
    """

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in (key, ts, *left_cols)}
        cols["side"] = pa.array(
            np.ones(t.num_rows, dtype=np.int8), type=pa.int8()
        )
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t.column(key), ts: t.column(ts)}
        n = t.num_rows
        for c in left_cols:
            cols[c] = pa.nulls(n, type=pa.int64())
        cols["side"] = pa.array(np.zeros(n, dtype=np.int8), type=pa.int8())
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return range_join_tagged(
        tagged, key=key, ts=ts, left_cols=left_cols, window_us=window_us
    )


def range_join_tagged(
    tagged: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    window_us: int = 60 * 60 * 1_000_000,
) -> rd.Dataset:
    """Range-join count over an already-tagged stream (``side`` 1 =
    left, 0 = right) — single-read path when both sides derive from the
    same source table (see asof_join_tagged)."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    ts: pa.array([], type=pa.timestamp("us")),
                    **{c: pa.array([], type=pa.int64()) for c in left_cols},
                    "n_in_window": pa.array([], type=pa.int64()),
                }
            )
        k = _np(t, key).astype(np.int64)
        tsu = _ts_us(t, ts)
        side = _np(t, "side").astype(np.int8)
        n = len(k)
        is_left = side == 1
        nl = int(is_left.sum())
        li = np.nonzero(is_left)[0]
        # probe stream: rights (prio 1) + lower probes (prio 0, ts-W) +
        # upper probes (prio 2, ts). prio orders equal timestamps so
        # rights at ts-W and at ts are both inside the interval.
        pk = np.concatenate([k[~is_left], k[li], k[li]])
        pt = np.concatenate(
            [tsu[~is_left], tsu[li] - np.int64(window_us), tsu[li]]
        )
        prio = np.concatenate(
            [
                np.ones(n - nl, dtype=np.int8),
                np.zeros(nl, dtype=np.int8),
                np.full(nl, 2, dtype=np.int8),
            ]
        )
        # probe id: which left row each probe belongs to (-1 for rights)
        pid = np.concatenate(
            [
                np.full(n - nl, -1, dtype=np.int64),
                np.arange(nl, dtype=np.int64),
                np.arange(nl, dtype=np.int64),
            ]
        )
        order = np.lexsort((prio, pt, pk))
        sk, sprio, spid = pk[order], prio[order], pid[order]
        cum = np.cumsum(sprio == 1)
        # reset count at key boundaries: subtract cum at key start
        new_key = np.r_[True, sk[1:] != sk[:-1]]
        base = np.maximum.accumulate(
            np.where(new_key, cum - (sprio == 1).astype(np.int64), -1)
        )
        rel = cum - np.maximum(base, 0)
        lower = np.zeros(nl, dtype=np.int64)
        upper = np.zeros(nl, dtype=np.int64)
        lo_mask = sprio == 0
        up_mask = sprio == 2
        lower[spid[lo_mask]] = rel[lo_mask]
        upper[spid[up_mask]] = rel[up_mask]
        # lower probe (prio 0) sorts BEFORE rights at the same ts, so
        # rel at the lower probe already excludes boundary rights —
        # count = rel[upper] - rel[lower] is the closed-interval count.
        counts = upper - lower
        cols: dict[str, pa.Array] = {
            key: pa.array(k[li], type=pa.int64()),
            ts: pa.array(tsu[li], type=pa.timestamp("us")),
        }
        for c in left_cols:
            lc = t.column(c).take(pa.array(li))
            cols[c] = lc.combine_chunks() if isinstance(lc, pa.ChunkedArray) else lc
        cols["n_in_window"] = pa.array(counts, type=pa.int64())
        return pa.table(cols)

    return _salt_key(tagged, key).groupby("part").map_groups(
        kernel, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) window aggregate
# ---------------------------------------------------------------------------


def hopping_window_agg(
    ds: rd.Dataset,
    *,
    group: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    size_us: int = 60 * 60 * 1_000_000,
    hop_us: int = 15 * 60 * 1_000_000,
    value_scale: float = 1e6,
) -> rd.Dataset:
    """Overlapping (hopping) window aggregate: every event contributes
    to the ``size/hop`` windows covering its timestamp; output is one
    row per (group, window_start) with count + quantized sum + min/max.

    Two-level aggregation: the fan-out (np.repeat of size/hop window
    keys) is combined per block BEFORE the exchange, so the shuffle
    moves one row per (group, window, block) — not per event.
    """
    assert size_us % hop_us == 0, "size must be a multiple of hop"
    k = size_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_hops(with_part=True)
        g = t.column(group).to_numpy(zero_copy_only=False)
        tsu = _ts_us(t, ts)
        v = _np(t, value).astype(np.float64)
        v_e6 = np.where(np.isnan(v), 0, np.floor(v * value_scale + 0.5)).astype(
            np.int64
        )
        v_ok = ~np.isnan(v)
        # windows covering tsu: starts floor(ts/hop)*hop - (k-1)*hop .. floor(ts/hop)*hop
        top = (tsu // hop_us) * hop_us
        n = len(tsu)
        starts = (
            np.repeat(top, k)
            - np.tile(np.arange(k - 1, -1, -1, dtype=np.int64) * hop_us, n)
        )
        gg = np.repeat(g, k)
        vv = np.repeat(v_e6, k)
        ok = np.repeat(v_ok, k)
        vmin = np.where(np.repeat(v_ok, k), np.repeat(v, k), np.inf)
        vmax = np.where(np.repeat(v_ok, k), np.repeat(v, k), -np.inf)
        # combine per (group, window) within the block
        gcodes, guniq = _factorize_str(gg)
        key64 = gcodes * np.int64(1 << 44) + (starts // hop_us)
        order = np.argsort(key64, kind="stable")
        key64, vv, ok, vmin, vmax = (
            key64[order], vv[order], ok[order], vmin[order], vmax[order],
        )
        gidx, sidx = gcodes[order], starts[order]
        new = np.r_[True, key64[1:] != key64[:-1]]
        st = np.nonzero(new)[0]
        return pa.table(
            {
                group: pa.array(guniq[gidx[st]], type=pa.string()),
                "window_start_us": pa.array(sidx[st], type=pa.int64()),
                "n": pa.array(
                    np.add.reduceat(ok.astype(np.int64), st), type=pa.int64()
                ),
                "sum_value_e6": pa.array(np.add.reduceat(vv, st), type=pa.int64()),
                "min_value": pa.array(np.minimum.reduceat(vmin, st), type=pa.float64()),
                "max_value": pa.array(np.maximum.reduceat(vmax, st), type=pa.float64()),
                "part": pa.array(
                    (sidx[st] // hop_us) % np.int64(_SALT_BUCKETS), type=pa.int64()
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_hops(with_part=False)
        g = t.column(group).to_numpy(zero_copy_only=False)
        w = _np(t, "window_start_us")
        nn = _np(t, "n")
        sv = _np(t, "sum_value_e6")
        mn = _np(t, "min_value").astype(np.float64)
        mx = _np(t, "max_value").astype(np.float64)
        gcodes, guniq = _factorize_str(g)
        order = np.lexsort((w, gcodes))
        gcodes, w, nn, sv, mn, mx = (
            gcodes[order], w[order], nn[order], sv[order], mn[order], mx[order],
        )
        new = np.r_[True, (gcodes[1:] != gcodes[:-1]) | (w[1:] != w[:-1])]
        st = np.nonzero(new)[0]
        n_out = np.add.reduceat(nn, st)
        mn_out = np.minimum.reduceat(mn, st)
        mx_out = np.maximum.reduceat(mx, st)
        keep = n_out > 0
        return pa.table(
            {
                group: pa.array(guniq[gcodes[st][keep]], type=pa.string()),
                "window_start_us": pa.array(w[st][keep], type=pa.int64()),
                "n": pa.array(n_out[keep], type=pa.int64()),
                "sum_value_e6": pa.array(np.add.reduceat(sv, st)[keep], type=pa.int64()),
                "min_value": pa.array(mn_out[keep], type=pa.float64()),
                "max_value": pa.array(mx_out[keep], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )


def _empty_hops(with_part: bool) -> pa.Table:
    cols = {
        "event_type": pa.array([], type=pa.string()),
        "window_start_us": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64()),
        "sum_value_e6": pa.array([], type=pa.int64()),
        "min_value": pa.array([], type=pa.float64()),
        "max_value": pa.array([], type=pa.float64()),
    }
    if with_part:
        cols["part"] = pa.array([], type=pa.int64())
    return pa.table(cols)


def _factorize_str(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Codes + uniques for an object/str array (np.unique-based)."""
    uniq, codes = np.unique(np.asarray(arr, dtype=object).astype(str), return_inverse=True)
    return codes.astype(np.int64), uniq


def hopping_distinct(
    ds: rd.Dataset,
    *,
    group: str = "event_type",
    ts: str = "ts",
    entity: str = "user_id",
    size_us: int = 60 * 60 * 1_000_000,
    hop_us: int = 15 * 60 * 1_000_000,
) -> rd.Dataset:
    """Exact distinct-entity count per hopping window (e.g. hourly
    active users every 15 minutes).

    COUNT DISTINCT's combiner is the distinct set itself, so the
    per-block partial DEDUPS the fanned-out (group, window, entity)
    triples before the exchange — the shuffle moves one row per
    distinct triple per block, never per event. Windows are salted by
    window index, so each (group, window)'s count resolves wholly
    inside one partition group; a second dedup there removes
    cross-block duplicates. NULL entities are dropped (SQL COUNT
    DISTINCT semantics)."""
    assert size_us % hop_us == 0, "size must be a multiple of hop"
    k = size_us // hop_us

    def _empty(with_part: bool) -> pa.Table:
        cols = {
            group: pa.array([], type=pa.string()),
            "window_start_us": pa.array([], type=pa.int64()),
            "entity": pa.array([], type=pa.int64()),
        }
        if with_part:
            cols["part"] = pa.array([], type=pa.int64())
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(with_part=True)
        import pyarrow.compute as pc

        valid = pc.is_valid(t.column(entity)).to_numpy(zero_copy_only=False)
        if not valid.all():
            t = t.filter(pa.array(valid))
            if t.num_rows == 0:
                return _empty(with_part=True)
        g = t.column(group).to_numpy(zero_copy_only=False)
        tsu = _ts_us(t, ts)
        ent = _np(t, entity).astype(np.int64)
        top = (tsu // hop_us) * hop_us
        n = len(tsu)
        starts = (
            np.repeat(top, k)
            - np.tile(np.arange(k - 1, -1, -1, dtype=np.int64) * hop_us, n)
        )
        gc1, guniq = _factorize_str(g)  # factorize once, then fan out codes
        gcodes = np.repeat(gc1, k)
        ee = np.repeat(ent, k)
        win = starts // hop_us
        order = np.lexsort((ee, win, gcodes))
        gcodes, win, ee, starts = (
            gcodes[order], win[order], ee[order], starts[order],
        )
        new = np.r_[
            True,
            (gcodes[1:] != gcodes[:-1]) | (win[1:] != win[:-1]) | (ee[1:] != ee[:-1]),
        ]
        return pa.table(
            {
                group: pa.array(guniq[gcodes[new]], type=pa.string()),
                "window_start_us": pa.array(starts[new], type=pa.int64()),
                "entity": pa.array(ee[new], type=pa.int64()),
                "part": pa.array(win[new] % np.int64(_SALT_BUCKETS), type=pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    group: pa.array([], type=pa.string()),
                    "window_start_us": pa.array([], type=pa.int64()),
                    "n_entities": pa.array([], type=pa.int64()),
                }
            )
        g = t.column(group).to_numpy(zero_copy_only=False)
        w = _np(t, "window_start_us")
        ee = _np(t, "entity")
        gcodes, guniq = _factorize_str(g)
        order = np.lexsort((ee, w, gcodes))
        gcodes, w, ee = gcodes[order], w[order], ee[order]
        uniq = np.r_[
            True,
            (gcodes[1:] != gcodes[:-1]) | (w[1:] != w[:-1]) | (ee[1:] != ee[:-1]),
        ]
        gcodes, w = gcodes[uniq], w[uniq]
        seg = np.r_[True, (gcodes[1:] != gcodes[:-1]) | (w[1:] != w[:-1])]
        st = np.nonzero(seg)[0]
        counts = np.diff(np.r_[st, len(gcodes)]).astype(np.int64)
        return pa.table(
            {
                group: pa.array(guniq[gcodes[st]], type=pa.string()),
                "window_start_us": pa.array(w[st], type=pa.int64()),
                "n_entities": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
