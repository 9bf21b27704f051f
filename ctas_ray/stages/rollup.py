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

from ..functions.codec import decode_series, encode_series

__all__ = [
    "extract_channels",
    "conv_chunk_rollup",
    "merge_tier_partials",
    "tier_select",
    "with_derived_stats",
]

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


def extract_channels(batch: pa.Table, chunk_turns: int = 100_000) -> pa.Table:
    """Stateless per-batch projection: (conv_id, turn_idx, ts_us, text_len)
    plus chunk assignment and boundary carry rows.

    carry = 0 normal row; 1 = previous chunk's last row replicated into
    the NEXT chunk (gives the next chunk its lag/LOCF predecessor);
    2 = next chunk's first row replicated into the PREVIOUS chunk
    (gives linear gap-fill its successor). Carry rows are never emitted
    as output rows by the group stage.
    """
    conv = batch["conv_id"]
    turn = pc.cast(batch["turn_idx"], pa.int64())
    ts_us = pc.cast(batch["ts"], pa.int64())
    tlen = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    chunk = pc.divide(turn, chunk_turns)
    base = pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn,
            "ts_us": ts_us,
            "text_len": tlen,
            "chunk": chunk,
            "carry": pa.array(np.zeros(len(batch), dtype=np.int8)),
        }
    )
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
    return pa.concat_tables(parts) if len(parts) > 1 else base


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
    "kind",
]


def _empty_union() -> pd.DataFrame:
    df = pd.DataFrame({c: pd.Series(dtype=object) for c in UNION_COLUMNS})
    return df


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


def tier_select(batch: pa.Table, kind: str) -> pa.Table:
    """Filter the union-schema group output down to one kind, dropping
    the other kind's all-null columns."""
    t = batch.filter(pc.equal(batch["kind"], kind))
    if kind == "t1":
        cols = TIER_PARTIAL_COLUMNS
    else:
        cols = ["conv_id", "channel", "chunk", "n", "blob", "first_ts", "last_ts", "roundtrip_ok"]
    return t.select([c for c in cols if c in t.schema.names])


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
