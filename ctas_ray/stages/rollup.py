"""[graft] Rollup / downsample stage bodies for the transcript engine.

Design (SURVEY.md §4.3 physical plan):

  read_parquet(transcripts)
    -> extract_channels (stateless map_batches, pyarrow, zero-copy):
         project (conv_id, turn_idx, ts, text_len), assign
         chunk = turn_idx // C  (salted sub-split of giant conversations)
         and duplicate chunk-boundary rows as carry rows so per-chunk
         lag/gap-fill is EXACT (no cross-chunk state needed)
    -> groupby(conv_id, chunk).map_groups(ConvChunkRollup):  shuffle #1
         sort by turn_idx, derive turn_latency_us, Gorilla-encode each
         channel (+ round-trip self-check), emit tier-1m partial
         aggregate rows + codec blob rows (union schema, 'kind' column)
    -> merge_tier_partials per (conv_id, channel, bucket):    tiny merges
         boundary buckets split across chunks re-merge EXACTLY
         (count/sum/min/max/sumsq are associative; first/last carry ts)
    -> cascade: tier 1m -> 1h -> 1d, each FROM the previous tier's
         partials, never from raw (A10, SURVEY.md §2.6)

All sums over integer-valued channels (text_len chars, turn_latency_us)
are exact in float64 (< 2^53), so tier re-aggregation is bit-exact and
order-independent — the property the tier-consistency tests pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codec import decode_series, encode_series, encode_series_batch

__all__ = [
    "extract_channels",
    "conv_chunk_rollup",
    "merge_tier_partials",
    "tier_select",
    "with_derived_stats",
]

_TIER_NAMES = {60: "1m", 3600: "1h", 86400: "1d", 604800: "1w"}


def tier_name(width_s: int) -> str:
    return _TIER_NAMES.get(width_s, f"{width_s}s")


TIER_PARTIAL_COLUMNS = [
    "conv_id",
    "channel",
    "bucket",
    "count",
    "sum",
    "min",
    "max",
    "sumsq",
    "first_ts",
    "first_val",
    "last_ts",
    "last_val",
]


def extract_channels(
    batch: pa.Table,
    chunk_turns: int = 100_000,
    salt_buckets: int = 0,
    keep_text: bool = False,
) -> pa.Table:
    """Stateless per-batch projection: (conv_id, turn_idx, ts_us, text_len)
    plus chunk assignment and boundary carry rows.

    carry = 0 normal row; 1 = previous chunk's last row replicated into
    the NEXT chunk (gives the next chunk its lag/LOCF predecessor);
    2 = next chunk's first row replicated into the PREVIOUS chunk
    (gives linear gap-fill its successor). Carry rows are never emitted
    as output rows by the group stage.

    With ``salt_buckets > 0`` a ``part = hash(conv_id, chunk) % buckets``
    column is added — the EXPLICIT salted-hash repartition key: the
    downstream exchange groups by ``part`` (bounded cardinality, giant
    conversations split across salts by chunk) and one partition UDF
    call processes MANY whole conv-chunks vectorized, instead of paying
    per-conversation UDF dispatch overhead.
    """
    conv = batch["conv_id"]
    turn = pc.cast(batch["turn_idx"], pa.int64())
    ts_us = pc.cast(batch["ts"], pa.int64())
    tlen = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    chunk = pc.divide(turn, chunk_turns)
    cols = {
        "conv_id": conv,
        "turn_idx": turn,
        "ts_us": ts_us,
        "text_len": tlen,
        "chunk": chunk,
        "carry": pa.array(np.zeros(len(batch), dtype=np.int8)),
    }
    if keep_text:
        cols["text"] = batch["text"]  # text archival: bytes DO shuffle
    base = pa.table(cols)
    # boundary replicas (no-ops for conversations within one chunk)
    turn_np = turn.to_numpy(zero_copy_only=False)
    last_of_chunk = (turn_np + 1) % chunk_turns == 0
    first_of_chunk = (turn_np % chunk_turns == 0) & (turn_np > 0)
    parts = [base]
    if last_of_chunk.any():
        idx = np.nonzero(last_of_chunk)[0]
        t = base.take(idx)
        t = t.set_column(
            t.schema.get_field_index("chunk"),
            "chunk",
            pc.add(t["chunk"], 1),
        )
        t = t.set_column(
            t.schema.get_field_index("carry"),
            "carry",
            pa.array(np.ones(len(idx), dtype=np.int8)),
        )
        parts.append(t)
    if first_of_chunk.any():
        idx = np.nonzero(first_of_chunk)[0]
        t = base.take(idx)
        t = t.set_column(
            t.schema.get_field_index("chunk"),
            "chunk",
            pc.subtract(t["chunk"], 1),
        )
        t = t.set_column(
            t.schema.get_field_index("carry"),
            "carry",
            pa.array(np.full(len(idx), 2, dtype=np.int8)),
        )
        parts.append(t)
    out = pa.concat_tables(parts) if len(parts) > 1 else base
    if salt_buckets:
        conv_np = out["conv_id"].to_numpy(zero_copy_only=False)
        chunk_np = out["chunk"].to_numpy(zero_copy_only=False)
        import zlib

        salt = np.fromiter(
            (
                zlib.crc32(f"{c}|{k}".encode()) % salt_buckets
                for c, k in zip(conv_np, chunk_np)
            ),
            dtype=np.int64,
            count=len(out),
        )
        out = out.append_column("part", pa.array(salt))
    return out


def _bucket(ts_us: np.ndarray, width_s: int) -> np.ndarray:
    w = width_s * 1_000_000
    return (np.floor_divide(ts_us, w)) * w


def _tier_partials(
    conv_id: str,
    channel: str,
    ts_us: np.ndarray,
    values: np.ndarray,
    width_s: int,
) -> pd.DataFrame:
    """One partial-aggregate row per bucket for a sorted series. NaN
    values (e.g. first-turn latency) are excluded from aggregates but
    not from the series (codec keeps them)."""
    ok = ~np.isnan(values)
    ts_ok, v_ok = ts_us[ok], values[ok]
    if len(ts_ok) == 0:
        return pd.DataFrame(columns=TIER_PARTIAL_COLUMNS)
    b = _bucket(ts_ok, width_s)
    # series is ts-sorted => buckets are non-decreasing: reduceat segments
    starts = np.nonzero(np.r_[True, b[1:] != b[:-1]])[0]
    ends = np.r_[starts[1:], len(b)]
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "channel": channel,
            "bucket": b[starts],
            "count": (ends - starts).astype(np.int64),
            "sum": np.add.reduceat(v_ok, starts),
            "min": np.minimum.reduceat(v_ok, starts),
            "max": np.maximum.reduceat(v_ok, starts),
            "sumsq": np.add.reduceat(v_ok * v_ok, starts),
            "first_ts": ts_ok[starts],
            "first_val": v_ok[starts],
            "last_ts": ts_ok[ends - 1],
            "last_val": v_ok[ends - 1],
        }
    )


UNION_COLUMNS = TIER_PARTIAL_COLUMNS + [
    "chunk",
    "n",
    "blob",
    "roundtrip_ok",
    "tier",
    "part",
    "rows_in",
    "n_convs",
    "wall_s",
    "kind",
]


def _empty_union() -> pd.DataFrame:
    df = pd.DataFrame({c: pd.Series(dtype=object) for c in UNION_COLUMNS})
    return df


# Explicit Arrow types for the union schema: the pipeline paths emit the
# partition output as ONE typed Arrow table instead of a NaN-padded
# pandas union frame. The pandas union pays ~450 B/row (object-string
# columns + 8-byte NaN pointers for every absent column) and pickles
# into the object store per element; the Arrow table is ~4x smaller,
# enters plasma zero-copy, and skips the concat+reindex object
# promotion that dominates the partition UDF profile at scale.
UNION_TYPES = {
    "conv_id": pa.string(),
    "channel": pa.string(),
    "bucket": pa.int64(),
    "count": pa.int64(),
    "sum": pa.float64(),
    "min": pa.float64(),
    "max": pa.float64(),
    "sumsq": pa.float64(),
    "first_ts": pa.int64(),
    "first_val": pa.float64(),
    "last_ts": pa.int64(),
    "last_val": pa.float64(),
    "chunk": pa.int64(),
    "n": pa.int64(),
    "blob": pa.large_binary(),
    "roundtrip_ok": pa.bool_(),
    "tier": pa.string(),
    "part": pa.int64(),
    "rows_in": pa.int64(),
    "n_convs": pa.int64(),
    "wall_s": pa.float64(),
    "kind": pa.string(),
}
UNION_SCHEMA = pa.schema([(c, UNION_TYPES[c]) for c in UNION_COLUMNS])

# Physical (in-flight) layout of the union blocks: Arrow allocates the
# FULL values buffer for a null fixed-width column (8 B/row of zeros
# through plasma for every column a kind doesn't populate) and plain
# strings repeat their bytes per row. Tier rows are ~95% of stage0
# output, so the union block's wire size is dominated by exactly these
# two costs. Dictionary physical types cut an absent column to its
# index width (1-4 B/row) and a low-cardinality string to ~1-4 B/row;
# parquet stores the same logical values either way, so everything
# read back from disk is unchanged. Sparse columns (populated only on
# the rare blob/pmeta rows) keep index width 4 to bound dictionary
# blow-up; `blob` uses 4-byte offsets (binary, not large_binary).
_DICT_IDX = {
    "conv_id": pa.int32(),
    "channel": pa.int8(),
    "kind": pa.int8(),
    "tier": pa.int8(),
    "chunk": pa.int32(),
    "n": pa.int32(),
    "part": pa.int32(),
    "rows_in": pa.int32(),
    "n_convs": pa.int32(),
    "wall_s": pa.int32(),
}
_PHYS_TYPES = {
    c: (
        pa.dictionary(_DICT_IDX[c], UNION_TYPES[c])
        if c in _DICT_IDX
        else (pa.binary() if c == "blob" else UNION_TYPES[c])
    )
    for c in UNION_COLUMNS
}
UNION_PHYS_SCHEMA = pa.schema([(c, _PHYS_TYPES[c]) for c in UNION_COLUMNS])


def _frames_to_union_arrow(
    frames: list[pd.DataFrame], label_fn=None
) -> pa.Table:
    """Concatenate heterogeneous per-kind frames into one typed Arrow
    union table; columns a frame lacks become null arrays (bitmap-only,
    not 8-byte NaN pointers).

    ``frames`` items are dicts of numpy columns, DataFrames, or
    ``(frame, const)`` pairs where ``const`` maps column -> scalar:
    constant columns (kind, tier, channel) are minted here as one C++
    ``pa.repeat`` each instead of ``.assign()`` copies that consolidate
    the whole frame.

    ``label_fn``: when the fused events path defers conv labels, frames
    carry int64 conv keys and the string labels are minted HERE, once
    per unique key per frame (dictionary build + one C++ cast), instead
    of fanning object strings through every cascade/merge pass."""
    batches = []
    for item in frames:
        f, const = item if isinstance(item, tuple) else (item, None)
        names = set(f.keys()) if isinstance(f, dict) else set(f.columns)
        n_rows = len(next(iter(f.values()))) if isinstance(f, dict) else len(f)
        arrays = []
        for c in UNION_COLUMNS:
            t = UNION_TYPES[c]
            pt = _PHYS_TYPES[c]
            is_dict = pa.types.is_dictionary(pt)
            if const is not None and c in const:
                if is_dict:
                    arrays.append(
                        pa.DictionaryArray.from_arrays(
                            np.zeros(n_rows, dtype=pt.index_type.to_pandas_dtype()),
                            pa.array([const[c]], type=t),
                        )
                    )
                else:
                    arrays.append(pa.repeat(pa.scalar(const[c], type=pt), n_rows))
                continue
            if c not in names:
                # absent column: null dictionary indices cost index-width
                # bytes, not the full value width
                arrays.append(
                    pa.DictionaryArray.from_arrays(
                        pa.nulls(n_rows, type=pt.index_type),
                        pa.array([], type=t),
                    )
                    if is_dict
                    else pa.nulls(n_rows, type=pt)
                )
                continue
            col = f[c]
            arr = col.to_numpy() if isinstance(col, pd.Series) else np.asarray(col)
            if c == "conv_id" and label_fn is not None and arr.dtype.kind in "iu":
                codes, uniq = pd.factorize(arr)
                arrays.append(
                    pa.DictionaryArray.from_arrays(
                        pa.array(codes, type=pa.int32()),
                        pa.array(label_fn(uniq), type=pa.string()),
                    )
                )
                continue
            # from_pandas=True keeps the pandas-path semantics (float
            # NaN -> null) for numpy inputs too
            plain = pa.array(arr, type=t, from_pandas=True)
            arrays.append(
                plain.dictionary_encode().cast(pt) if is_dict else
                (plain.cast(pt) if pt != t else plain)
            )
        batches.append(pa.record_batch(arrays, schema=UNION_PHYS_SCHEMA))
    if not batches:
        return UNION_PHYS_SCHEMA.empty_table()
    return pa.Table.from_batches(batches, schema=UNION_PHYS_SCHEMA)


def conv_chunk_rollup(
    group: pd.DataFrame,
    tier1_s: int = 60,
    with_codec: bool = True,
    verify_roundtrip: bool = False,
) -> pd.DataFrame:
    """Per-(conv_id, chunk) group body: sort turns, derive channels,
    tier-1 partials + Gorilla blobs. Union output schema with 'kind':

    kind='t1'   -> TIER_PARTIAL_COLUMNS
    kind='blob' -> conv_id, channel, chunk, n, blob, first_ts, last_ts,
                   roundtrip_ok
    """
    group = group.sort_values(["turn_idx", "carry"], kind="mergesort")
    conv_id = group["conv_id"].iloc[0]
    chunk = int(group.loc[group["carry"] == 0, "chunk"].iloc[0]) if (group["carry"] == 0).any() else None
    if chunk is None:
        # carry-only group (conversation boundary artefact): emit nothing,
        # with the full union schema so block schemas stay consistent
        return _empty_union()
    ts_all = group["ts_us"].to_numpy(dtype=np.int64)
    carry = group["carry"].to_numpy()
    real = carry == 0
    # lag over the full sequence (carry-1 head row provides the exact
    # predecessor for the chunk's first turn)
    lat_all = np.diff(ts_all, prepend=ts_all[:1]).astype(np.float64)
    lat_all[0] = np.nan
    ts = ts_all[real]
    channels = {
        "text_len": group.loc[real, "text_len"].to_numpy(dtype=np.float64),
        "turn_latency_us": lat_all[real.nonzero()[0]].copy(),
    }
    # carry-1 row exists => chunk's first real turn has an exact lag;
    # otherwise (chunk 0) the first latency stays NaN
    if not (carry == 1).any():
        channels["turn_latency_us"][:1] = np.nan

    frames: list[pd.DataFrame] = []
    for name, vals in channels.items():
        t1 = _tier_partials(conv_id, name, ts, vals, tier1_s)
        t1["kind"] = "t1"
        frames.append(t1)
        if with_codec:
            blob = encode_series(ts, vals)
            ok = True
            if verify_roundtrip:
                ts2, v2 = decode_series(blob)
                ok = bool(
                    np.array_equal(ts2, ts)
                    and np.array_equal(
                        v2.view(np.uint64), vals.view(np.uint64)
                    )
                )
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": [conv_id],
                        "channel": [name],
                        "chunk": [chunk],
                        "n": [len(ts)],
                        "blob": [blob],
                        "first_ts": [ts[0] if len(ts) else 0],
                        "last_ts": [ts[-1] if len(ts) else 0],
                        "roundtrip_ok": [ok],
                        "kind": ["blob"],
                    }
                )
            )
    out = pd.concat(frames, ignore_index=True)
    return out.reindex(columns=UNION_COLUMNS)


def _points_to_partials(
    conv_by_seg: np.ndarray,
    sid: np.ndarray,
    t_ok: np.ndarray,
    v_ok: np.ndarray,
    tier1_s: int,
) -> dict[str, np.ndarray]:
    """Segment-tagged sorted points -> one partial row per
    (segment, bucket) via segment detection + np.reduceat.

    Returns a plain dict of numpy columns (NOT a DataFrame): the inline
    partial/cascade plumbing stays in unboxed arrays end to end — the
    pandas BlockManager construction + consolidation this avoids was
    ~20% of the partition UDF profile. The constant ``channel`` column
    is NOT materialized; callers carry it in the frame's const dict."""
    b = _bucket(t_ok, tier1_s)
    cut = np.r_[True, (sid[1:] != sid[:-1]) | (b[1:] != b[:-1])]
    starts = np.nonzero(cut)[0]
    ends = np.r_[starts[1:], len(b)]
    return {
        "_seg": sid[starts],  # caller-internal (complete-flag routing)
        "conv_id": conv_by_seg[sid[starts]],
        "bucket": b[starts],
        "count": (ends - starts).astype(np.int64),
        "sum": np.add.reduceat(v_ok, starts),
        "min": np.minimum.reduceat(v_ok, starts),
        "max": np.maximum.reduceat(v_ok, starts),
        "sumsq": np.add.reduceat(v_ok * v_ok, starts),
        "first_ts": t_ok[starts],
        "first_val": v_ok[starts],
        "last_ts": t_ok[ends - 1],
        "last_val": v_ok[ends - 1],
    }


def _take_cols(cols: dict[str, np.ndarray], mask: np.ndarray) -> dict[str, np.ndarray]:
    return {k: v[mask] for k, v in cols.items()}


def _merge_tiers_cols(
    cols: dict[str, np.ndarray], width_s: int, presorted: bool = False
) -> dict[str, np.ndarray]:
    """Single-channel, dict-of-arrays variant of
    :func:`partition_merge_tiers` for the inline cascade: the channel is
    constant (carried outside the columns) so the per-row object-string
    factorize disappears; conv keys are int64 on the fused path (radix
    factorize) or objects on the generic path.

    ``presorted``: the inline-cascade inputs are ALREADY in ascending
    (conv, bucket) order with monotone first/last timestamps within
    each conversation (partial rows cover disjoint time windows), so
    both lexsorts AND every gather collapse to reduceat over the input
    as-is — this invariant holds for _points_to_partials output, the
    gap-filled grid, and recursively for each merged tier.

    Same canonical-order contract either way: float partials are summed
    in ascending (finer bucket, first_ts) order — bit-identical merges
    no matter how the inputs were chunk-split."""
    conv = cols["conv_id"]
    bucket = _bucket(cols["bucket"], width_s)
    f_ts, l_ts = cols["first_ts"], cols["last_ts"]
    if conv.dtype.kind in "iu":
        conv_codes = conv
    else:
        conv_codes, _ = pd.factorize(conv, sort=True)
    if presorted:
        cut = np.r_[
            True, (conv_codes[1:] != conv_codes[:-1]) | (bucket[1:] != bucket[:-1])
        ]
        starts = np.nonzero(cut)[0]
        ends = np.r_[starts[1:], len(bucket)]
        return {
            "conv_id": conv[starts],
            "bucket": bucket[starts],
            "count": np.add.reduceat(cols["count"], starts),
            "sum": np.add.reduceat(cols["sum"], starts),
            "min": np.minimum.reduceat(cols["min"], starts),
            "max": np.maximum.reduceat(cols["max"], starts),
            "sumsq": np.add.reduceat(cols["sumsq"], starts),
            "first_ts": f_ts[starts],
            "first_val": cols["first_val"][starts],
            "last_ts": l_ts[ends - 1],
            "last_val": cols["last_val"][ends - 1],
        }
    order = np.lexsort((f_ts, bucket, conv_codes))
    kc, b = conv_codes[order], bucket[order]
    cut = np.r_[True, (kc[1:] != kc[:-1]) | (b[1:] != b[:-1])]
    starts = np.nonzero(cut)[0]
    ends = np.r_[starts[1:], len(b)]
    order_last = np.lexsort((l_ts, bucket, conv_codes))
    return {
        "conv_id": conv[order][starts],
        "bucket": b[starts],
        "count": np.add.reduceat(cols["count"][order], starts),
        "sum": np.add.reduceat(cols["sum"][order], starts),
        "min": np.minimum.reduceat(cols["min"][order], starts),
        "max": np.maximum.reduceat(cols["max"][order], starts),
        "sumsq": np.add.reduceat(cols["sumsq"][order], starts),
        "first_ts": f_ts[order][starts],
        "first_val": cols["first_val"][order][starts],
        "last_ts": l_ts[order_last][ends - 1],
        "last_val": cols["last_val"][order_last][ends - 1],
    }


def _cascade_frames_cols(
    cols: dict[str, np.ndarray],
    tiers_s: tuple[int, ...],
    presorted: bool = True,
) -> list[tuple[dict[str, np.ndarray], str]]:
    """Dict-of-arrays inline cascade: raw partials -> every retention
    tier, each higher tier merged FROM the previous tier's rows (A10).
    Sortedness is preserved tier to tier, so ``presorted`` propagates."""
    out = []
    cur = _merge_tiers_cols(cols, tiers_s[0], presorted=presorted)
    out.append((cur, tier_name(tiers_s[0])))
    for width in tiers_s[1:]:
        cur = _merge_tiers_cols(cur, width, presorted=presorted)
        out.append((cur, tier_name(width)))
    return out


def _gapfill_segments(
    sid: np.ndarray,
    t_ok: np.ndarray,
    v_ok: np.ndarray,
    method: str,
    step_us: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment gap-fill of sorted (segment, ts, value) points onto
    the epoch-aligned grid; returns segment-tagged grid points (NaN grid
    values dropped)."""
    from ..functions.series import gap_fill

    cut = np.r_[True, sid[1:] != sid[:-1]]
    sstarts = np.nonzero(cut)[0]
    sends = np.r_[sstarts[1:], len(sid)]
    g_sid, g_ts, g_v = [], [], []
    for s0, e0 in zip(sstarts, sends):
        t_seg, v_seg = t_ok[s0:e0], v_ok[s0:e0]
        # duplicate-timestamp rule: keep the LAST point per ts (turn
        # order), matching LOCF's searchsorted pick and the oracle's
        # arg_max(v, turn_ix) — linear interp needs the dedup explicitly
        keep = np.r_[t_seg[1:] != t_seg[:-1], True]
        grid, out = gap_fill(t_seg[keep], v_seg[keep], step_us, method)
        keep = ~np.isnan(out)
        if keep.any():
            g_ts.append(grid[keep])
            g_v.append(out[keep])
            g_sid.append(np.full(int(keep.sum()), sid[s0], dtype=sid.dtype))
    if not g_ts:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, np.empty(0, dtype=np.float64)
    return (
        np.concatenate(g_sid),
        np.concatenate(g_ts),
        np.concatenate(g_v),
    )


def partition_rollup(
    part: pd.DataFrame,
    tier1_s: int = 60,
    with_codec: bool = True,
    verify_roundtrip: bool = False,
    inline_tiers_s: tuple[int, ...] | None = None,
    with_text: bool = False,
    emit_partition_manifest: bool = True,
    gapfill: tuple[str, int] | None = None,
    presorted: bool = False,
    conv_labels=None,
    arrow_out: bool = False,
) -> pd.DataFrame | pa.Table:
    """Vectorized partition body: ONE call processes every conv-chunk of
    a salted-hash partition (``part`` column from extract_channels).

    Produces exactly the same union rows as running
    :func:`conv_chunk_rollup` once per (conv_id, chunk) group
    (equivalence pinned by tests), but with per-PARTITION instead of
    per-CONVERSATION UDF dispatch: segment detection + np.reduceat for
    the bucket partials, one Python loop only where the codec needs it.
    At 10^8 conversations this removes ~10ms x n_convs of group-dispatch
    overhead — the difference between hours and weeks at 100 TB.

    With ``inline_tiers_s`` set, conversations that are COMPLETE in this
    partition (single chunk — the overwhelming majority; the stage-0
    exchange already co-locates them) get their ENTIRE retention cascade
    computed here and emitted as kind='tier' rows; only multi-chunk
    (giant) conversations emit kind='t1' partials for the (now tiny)
    merge exchange. One shuffle rolls up almost everything.

    ``gapfill`` = (method, step_s) regularises each complete series onto
    the epoch-aligned grid BEFORE tier-1 aggregation (SURVEY F10
    placement); requires ``inline_tiers_s``. Multi-chunk conversations
    fall back to raw partials (their grid ownership across chunk
    boundaries is not defined here) — logged once per partition.
    """
    import time as _time

    t_start = _time.perf_counter()
    if presorted:
        df = part
    else:
        df = part.sort_values(["conv_id", "chunk", "turn_idx", "carry"], kind="mergesort")
    # ``conv`` may be ANY comparable key array (e.g. int64 user ids on
    # the fused events path — faster sort/compare than object strings);
    # ``conv_labels`` maps per-SEGMENT keys to output conv_id labels.
    conv = df["conv_id"].to_numpy()
    if conv.dtype.kind not in "iu":
        conv = df["conv_id"].to_numpy(dtype=object)
    chunk = df["chunk"].to_numpy(dtype=np.int64)
    carry = df["carry"].to_numpy()
    ts = df["ts_us"].to_numpy(dtype=np.int64)
    tlen = df["text_len"].to_numpy(dtype=np.float64)
    n = len(df)
    if n == 0:
        return UNION_PHYS_SCHEMA.empty_table() if arrow_out else _empty_union()
    newseg = np.r_[True, (conv[1:] != conv[:-1]) | (chunk[1:] != chunk[:-1])]
    seg_id = np.cumsum(newseg) - 1
    seg_starts = np.nonzero(newseg)[0]
    # lag within segment: carry-1 head rows supply the exact cross-chunk
    # predecessor; segment-first rows (carry head or true first turn) NaN
    lat = np.diff(ts, prepend=ts[:1]).astype(np.float64)
    lat[seg_starts] = np.nan

    real = carry == 0
    # per-segment "conversation complete here" flag: chunk 0 and no
    # carry-2 row (a carry-2 row proves a further chunk exists)
    n_segs = seg_id[-1] + 1
    has_next = np.zeros(n_segs, dtype=bool)
    np.logical_or.at(has_next, seg_id, carry == 2)
    seg_chunk = chunk[seg_starts]
    seg_complete = (seg_chunk == 0) & ~has_next

    if gapfill is not None and inline_tiers_s is None:
        raise ValueError("gapfill requires inline_tiers_s (complete-conversation cascade)")

    conv_by_seg = conv[seg_starts]
    # with Arrow output, int conv keys stay int through every partial /
    # cascade / codec pass and labels are minted once per unique key at
    # the final assembly (see _frames_to_union_arrow)
    defer_labels = (
        conv_labels is not None and arrow_out and conv_by_seg.dtype.kind in "iu"
    )
    if conv_labels is not None and not defer_labels:
        conv_by_seg = conv_labels(conv_by_seg)
    frames: list[pd.DataFrame] = []
    warned_gapfill_fallback = False
    for channel, values in (("text_len", tlen), ("turn_latency_us", lat)):
        ok = real & ~np.isnan(values)
        if ok.any():
            if gapfill is None:
                partials = _points_to_partials(
                    conv_by_seg, seg_id[ok], ts[ok], values[ok], tier1_s
                )
                complete_mask = seg_complete[partials.pop("_seg")]
                if inline_tiers_s is None:
                    frames.append((partials, {"kind": "t1", "channel": channel}))
                else:
                    if not complete_mask.all():
                        multi = _take_cols(partials, ~complete_mask)
                        frames.append((multi, {"kind": "t1", "channel": channel}))
                    if complete_mask.any():
                        done_part = (
                            partials
                            if complete_mask.all()
                            else _take_cols(partials, complete_mask)
                        )
                        for tdf, tname in _cascade_frames_cols(
                            done_part, inline_tiers_s
                        ):
                            frames.append(
                                (tdf, {"kind": "tier", "tier": tname, "channel": channel})
                            )
            else:
                method, step_s = gapfill
                comp_rows = ok & seg_complete[seg_id]
                raw_rows = ok & ~seg_complete[seg_id]
                if raw_rows.any():
                    if not warned_gapfill_fallback:
                        import logging

                        logging.getLogger("ctas_ray.rollup").warning(
                            "gapfill_tiers: multi-chunk conversations present; "
                            "their tiers use RAW (un-gap-filled) points"
                        )
                        warned_gapfill_fallback = True
                    raw_partials = _points_to_partials(
                        conv_by_seg, seg_id[raw_rows], ts[raw_rows],
                        values[raw_rows], tier1_s,
                    )
                    raw_partials.pop("_seg")
                    frames.append((raw_partials, {"kind": "t1", "channel": channel}))
                if comp_rows.any():
                    g_sid, g_ts, g_v = _gapfill_segments(
                        seg_id[comp_rows], ts[comp_rows], values[comp_rows],
                        method, step_s * 1_000_000,
                    )
                    if len(g_ts):
                        done_part = _points_to_partials(
                            conv_by_seg, g_sid, g_ts, g_v, tier1_s
                        )
                        done_part.pop("_seg")
                        for tdf, tname in _cascade_frames_cols(
                            done_part, inline_tiers_s
                        ):
                            frames.append(
                                (tdf, {"kind": "tier", "tier": tname, "channel": channel})
                            )
        if with_codec:
            # batch encode over REAL rows (NaNs kept in the series): rows
            # are segment-sorted, so the real-row subset preserves the
            # segment grouping and ONE encode_series_batch call handles
            # every series of the partition (per-call fixed cost paid
            # once, not once per conv-chunk)
            idx_real = np.nonzero(real)[0]
            real_counts = np.add.reduceat(real.astype(np.int64), seg_starts)
            kept = np.nonzero(real_counts > 0)[0]
            rows_conv, rows_chunk, rows_n = [], [], []
            rows_blob, rows_f, rows_l, rows_ok = [], [], [], []
            if len(kept):
                ts_real = ts[idx_real]
                v_real = values[idx_real]
                kept_counts = real_counts[kept]
                kept_starts = np.r_[0, np.cumsum(kept_counts)[:-1]]
                kept_ends = kept_starts + kept_counts
                blobs = encode_series_batch(ts_real, v_real, kept_starts)
                first_idx = idx_real[kept_starts]
                rows_conv = list(conv_by_seg[kept])
                rows_chunk = chunk[first_idx].astype(np.int64).tolist()
                rows_n = kept_counts.astype(np.int64).tolist()
                rows_blob = blobs
                rows_f = ts_real[kept_starts].astype(np.int64).tolist()
                rows_l = ts_real[kept_ends - 1].astype(np.int64).tolist()
                if verify_roundtrip:
                    rows_ok = []
                    for ki in range(len(kept)):
                        s0, e0 = kept_starts[ki], kept_ends[ki]
                        ts2, v2 = decode_series(blobs[ki])
                        rows_ok.append(bool(
                            np.array_equal(ts2, ts_real[s0:e0])
                            and np.array_equal(
                                v2.view(np.uint64),
                                v_real[s0:e0].view(np.uint64),
                            )
                        ))
                else:
                    rows_ok = [True] * len(kept)
            if rows_conv:
                frames.append(
                    (
                        {
                            "conv_id": np.asarray(rows_conv),
                            "chunk": np.asarray(rows_chunk, dtype=np.int64),
                            "n": np.asarray(rows_n, dtype=np.int64),
                            "blob": np.asarray(rows_blob, dtype=object),
                            "first_ts": np.asarray(rows_f, dtype=np.int64),
                            "last_ts": np.asarray(rows_l, dtype=np.int64),
                            "roundtrip_ok": np.asarray(rows_ok, dtype=bool),
                        },
                        {"channel": channel, "kind": "blob"},
                    )
                )
    if with_text and "text" in df.columns:
        # [graft] per-row text invariant: archive the turn texts per
        # (conv, chunk) as compressed blocks; decode under the stable
        # (conv_id, turn_idx) order is byte-equal (M10)
        from ..functions.codec import decode_text_block, encode_text_block

        seg_ends_t = np.r_[seg_starts[1:], n]
        texts_all = df["text"].to_numpy(dtype=object)
        rows = {"conv_id": [], "chunk": [], "n": [], "blob": [],
                "first_ts": [], "last_ts": [], "roundtrip_ok": []}
        for si, (s, e) in enumerate(zip(seg_starts, seg_ends_t)):
            rmask = real[s:e]
            if not rmask.any():
                continue
            idx = np.nonzero(rmask)[0] + s
            texts = list(texts_all[idx])
            blob = encode_text_block(texts)
            ok_flag = True
            if verify_roundtrip:
                ok_flag = decode_text_block(blob) == texts
            rows["conv_id"].append(conv_by_seg[si])
            rows["chunk"].append(int(chunk[idx[0]]))
            rows["n"].append(len(idx))
            rows["blob"].append(blob)
            rows["first_ts"].append(int(ts[idx[0]]))
            rows["last_ts"].append(int(ts[idx[-1]]))
            rows["roundtrip_ok"].append(ok_flag)
        if rows["conv_id"]:
            frames.append(
                (pd.DataFrame(rows), {"channel": "__text__", "kind": "textblob"})
            )

    if emit_partition_manifest:
        # [graft] per-partition lineage + throughput row (S2): every
        # salt bucket of the big exchange records what it processed.
        # A hash-repartitioned block may hold SEVERAL salt buckets
        # (hash collisions of part % num_blocks), so lineage is emitted
        # per distinct part value, exact per bucket.
        elapsed = _time.perf_counter() - t_start
        if "part" in part.columns:
            pvals = df["part"].to_numpy()
            uniq_p = np.unique(pvals)
            seg_part = pvals[seg_starts]
            pm = {"part": [], "rows_in": [], "n_convs": [], "wall_s": []}
            for pv in uniq_p:
                pm["part"].append(int(pv))
                pm["rows_in"].append(int((real & (pvals == pv)).sum()))
                pm["n_convs"].append(
                    int(len(np.unique(conv[seg_starts[seg_part == pv]])))
                )
            # wall_s is an APPORTIONMENT, not a per-bucket measurement:
            # buckets co-located in one block share one timed UDF call,
            # so the block's wall is split pro-rata by rows_in (uniform
            # when the block carried no real rows). Only the block-level
            # SUM of wall_s is exact; per-bucket skew analysis should
            # lean on rows_in / n_convs, not wall_s. (ADVICE r3)
            w = np.asarray(pm["rows_in"], dtype=np.float64) + 1.0
            pm["wall_s"] = list(elapsed * w / w.sum())
            frames.append((pd.DataFrame(pm), {"kind": "pmeta"}))
        else:
            frames.append(
                (
                    pd.DataFrame(
                        {
                            "part": [-1],
                            "rows_in": [int(real.sum())],
                            "n_convs": [int(len(np.unique(conv[seg_starts])))],
                            "wall_s": [elapsed],
                        }
                    ),
                    {"kind": "pmeta"},
                )
            )

    if arrow_out:
        return _frames_to_union_arrow(
            frames, label_fn=conv_labels if defer_labels else None
        )
    if not frames:
        return _empty_union()
    return pd.concat(
        [
            (pd.DataFrame(f) if isinstance(f, dict) else f).assign(**const)
            for f, const in frames
        ],
        ignore_index=True,
    ).reindex(columns=UNION_COLUMNS)


def _uid_labels(uids: np.ndarray) -> np.ndarray:
    """Per-segment conv_id labels for the events path ('u' + user id)."""
    return np.array([f"u{int(u)}" for u in uids], dtype=object)


def fused_events_rollup(
    g,
    tier1_s: int = 60,
    with_codec: bool = True,
    verify_roundtrip: bool = False,
    inline_tiers_s: tuple[int, ...] | None = (60, 3600, 86400),
    gapfill: tuple[str, int] | None = None,
) -> pa.Table:
    """Fused partition body for the events-derived input: ONE exchange
    (salted by conversation) carries turn derivation + channel extraction
    + the whole rollup/cascade/codec. Conversations are complete within
    their partition, so no chunk-carry machinery and no second exchange
    are needed, and the role/tool/text strings are never materialized —
    only (ts, text_len) leave the partition UDF.

    Arrow-native: accepts a ``pa.Table`` (preferred — the exchange then
    moves zero-copy Arrow blocks and the group key is int64 user_id, not
    object strings) or a legacy pandas frame. conv_id strings are minted
    per SEGMENT at output time, never per input row."""
    if isinstance(g, pa.Table):
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            g["ts_us"].to_numpy(zero_copy_only=False)
            if "ts_us" in g.schema.names
            else pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        tlen = g["text_len"].to_numpy(zero_copy_only=False)
        part_arr = (
            g["part"].to_numpy(zero_copy_only=False)
            if "part" in g.schema.names and len(g) else None
        )
    else:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy() if "ts_us" not in g.columns else g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        if "text_len" in g.columns:
            tlen = g["text_len"].to_numpy(dtype=np.int64)
        else:
            tlen = g["props"].str.len().to_numpy(dtype=np.int64)
        part_arr = g["part"].to_numpy() if "part" in g.columns and len(g) else None
    n = len(uid)
    if n == 0:
        return UNION_PHYS_SCHEMA.empty_table()
    order = np.lexsort((eid, ts, uid))
    df = pd.DataFrame(
        {
            "conv_id": uid[order],  # int64 keys; labels minted per segment
            "ts_us": ts[order],
            "text_len": tlen[order],
            "chunk": np.zeros(n, dtype=np.int64),
            "carry": np.zeros(n, dtype=np.int8),
        }
    )
    if part_arr is not None:
        # per ROW: a hash-repartitioned block may hold several salt
        # buckets; lineage stays exact per bucket downstream
        df["part"] = part_arr[order]
    return partition_rollup(
        df,
        tier1_s=tier1_s,
        with_codec=with_codec,
        verify_roundtrip=verify_roundtrip,
        inline_tiers_s=inline_tiers_s,
        gapfill=gapfill,
        presorted=True,
        conv_labels=_uid_labels,
        arrow_out=True,
    )


def merge_tier_partials(group: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Merge partial rows of one (conv_id, channel) onto ``width_s``
    buckets — the cascade step (1m->1h->1d) and the chunk-boundary
    re-merge. Exact: count/sum/min/max/sumsq are associative; first/last
    resolved by carried first_ts/last_ts."""
    g = group.copy()
    g["bucket"] = _bucket(g["bucket"].to_numpy(dtype=np.int64), width_s)
    g = g.sort_values(["bucket", "first_ts"], kind="mergesort")
    lasts = g.sort_values(["bucket", "last_ts"], kind="mergesort").groupby("bucket").tail(1)
    agg = g.groupby("bucket", sort=True).agg(
        conv_id=("conv_id", "first"),
        channel=("channel", "first"),
        count=("count", "sum"),
        sum=("sum", "sum"),
        min=("min", "min"),
        max=("max", "max"),
        sumsq=("sumsq", "sum"),
        first_ts=("first_ts", "first"),
        first_val=("first_val", "first"),
    )
    agg["last_ts"] = lasts.set_index("bucket")["last_ts"]
    agg["last_val"] = lasts.set_index("bucket")["last_val"]
    return agg.reset_index()[TIER_PARTIAL_COLUMNS]


def partition_merge_tiers(part: pd.DataFrame, width_s: int) -> pd.DataFrame:
    """Vectorized partial merge for a conv-salted partition: merges ALL
    (conv_id, channel, bucket) groups of the partition in one numpy
    pass (lexsort + reduceat), equivalent to merge_tier_partials per
    (conv_id, channel) group.

    Canonical-order contract: float partials are summed in ascending
    (finer bucket, first_ts) order, so the merged sums are bit-identical
    no matter how the inputs were partitioned or chunk-split."""
    if len(part) == 0:
        return pd.DataFrame(columns=TIER_PARTIAL_COLUMNS)
    conv = part["conv_id"].to_numpy()
    if conv.dtype.kind not in "iu":
        # object labels (generic path); int64 keys (fused path) stay
        # unboxed — factorize on ints is a radix pass, not per-row
        # string hashing
        conv = part["conv_id"].to_numpy(dtype=object)
    chan = part["channel"].to_numpy(dtype=object)
    bucket = _bucket(part["bucket"].to_numpy(dtype=np.int64), width_s)
    cnt = part["count"].to_numpy(dtype=np.int64)
    s = part["sum"].to_numpy(dtype=np.float64)
    mn = part["min"].to_numpy(dtype=np.float64)
    mx = part["max"].to_numpy(dtype=np.float64)
    sq = part["sumsq"].to_numpy(dtype=np.float64)
    f_ts = part["first_ts"].to_numpy(dtype=np.int64)
    f_v = part["first_val"].to_numpy(dtype=np.float64)
    l_ts = part["last_ts"].to_numpy(dtype=np.int64)
    l_v = part["last_val"].to_numpy(dtype=np.float64)
    # conv/channel -> dense codes for lexsort. Factorize each column
    # separately and combine numerically: building a MultiIndex
    # materializes a tuple per ROW (the dominant cost of this function),
    # while per-column factorize only sorts the few unique values.
    conv_codes, conv_uniq = pd.factorize(conv, sort=True)
    chan_codes, chan_uniq = pd.factorize(chan, sort=True)
    key_codes = conv_codes.astype(np.int64) * len(chan_uniq) + chan_codes
    order = np.lexsort((f_ts, bucket, key_codes))
    kc, b = key_codes[order], bucket[order]
    cut = np.r_[True, (kc[1:] != kc[:-1]) | (b[1:] != b[:-1])]
    starts = np.nonzero(cut)[0]
    ends = np.r_[starts[1:], len(b)]
    # 'last' selection: re-sort by last_ts within the same segments
    order_last = np.lexsort((l_ts, bucket, key_codes))
    out = pd.DataFrame(
        {
            "conv_id": conv[order][starts],
            "channel": chan[order][starts],
            "bucket": b[starts],
            "count": np.add.reduceat(cnt[order], starts),
            "sum": np.add.reduceat(s[order], starts),
            "min": np.minimum.reduceat(mn[order], starts),
            "max": np.maximum.reduceat(mx[order], starts),
            "sumsq": np.add.reduceat(sq[order], starts),
            "first_ts": f_ts[order][starts],
            "first_val": f_v[order][starts],
            "last_ts": l_ts[order_last][ends - 1],
            "last_val": l_v[order_last][ends - 1],
        }
    )
    return out[TIER_PARTIAL_COLUMNS]


def partition_cascade_frames(
    part: pd.DataFrame, tiers_s: tuple[int, ...] = (60, 3600, 86400)
) -> list[tuple[pd.DataFrame, str]]:
    """One conv-salted partition -> ALL retention tiers in one pass:
    merge raw partials to the first tier, then cascade each higher tier
    FROM the previous tier's rows (A10: never from raw). Returns
    ``[(tier_frame, tier_name), ...]`` WITHOUT materializing the tier
    label column — the Arrow union assembly mints it as a constant."""
    if "part" in part.columns:
        part = part.drop(columns=["part"])
    out = []
    cur = partition_merge_tiers(part, tiers_s[0])
    out.append((cur, tier_name(tiers_s[0])))
    for width in tiers_s[1:]:
        cur = partition_merge_tiers(cur, width)
        out.append((cur, tier_name(width)))
    return out


def partition_cascade(
    part: pd.DataFrame, tiers_s: tuple[int, ...] = (60, 3600, 86400)
) -> pd.DataFrame:
    """Pandas-frame variant of :func:`partition_cascade_frames` with the
    ``tier`` column ('1m'/'1h'/'1d') materialized."""
    return pd.concat(
        [df.assign(tier=tn) for df, tn in partition_cascade_frames(part, tiers_s)],
        ignore_index=True,
    )


def add_conv_salt(batch: pd.DataFrame, salt_buckets: int) -> pd.DataFrame:
    """Attach the conv-keyed salt column for the tier-merge exchange
    (all chunks/partials of one conversation land in one partition).
    Vectorized hash — any deterministic conv_id -> bucket map works
    here (partition-invariance of the merge is pinned by tests)."""
    h = pd.util.hash_array(batch["conv_id"].to_numpy())
    batch["part"] = (h % np.uint64(salt_buckets)).astype(np.int64)
    return batch


def decode_union_dicts(t: pa.Table) -> pa.Table:
    """Cast the union blocks' dictionary-typed columns back to their
    logical types — applied at the in-memory API boundary (datasets a
    caller consumes) so pandas users never see Categorical; the write
    path keeps the dictionary layout for its ~2x wire-size win."""
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, pc.cast(t[f.name], f.type.value_type))
    return t


def tier_select(batch: pa.Table, kind: str) -> pa.Table:
    """Filter the union-schema group output down to one kind, dropping
    the other kind's all-null columns. Output is dictionary-decoded
    (this is a consumer-facing boundary)."""
    t = batch.filter(pc.equal(batch["kind"], kind))
    if kind == "t1":
        cols = TIER_PARTIAL_COLUMNS
    else:
        cols = ["conv_id", "channel", "chunk", "n", "blob", "first_ts", "last_ts", "roundtrip_ok"]
    return decode_union_dicts(t.select([c for c in cols if c in t.schema.names]))


def with_derived_stats(batch: pa.Table) -> pa.Table:
    """Derive mean/sd at READ time from the exact partials so tier
    re-aggregation stays lossless (A10: 'mean/sd derived at read')."""
    cnt = batch["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = batch["sum"].to_numpy(zero_copy_only=False)
    q = batch["sumsq"].to_numpy(zero_copy_only=False)
    with np.errstate(all="ignore"):
        mean = s / cnt
        var = (q - s * s / cnt) / (cnt - 1.0)
        sd = np.sqrt(np.maximum(var, 0.0))
    sd[cnt < 2] = np.nan
    out = batch.append_column("mean", pa.array(mean))
    out = out.append_column("sd", pa.array(sd))
    return out
