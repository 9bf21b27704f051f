"""[graft] The rollup + downsample + retention pipeline over transcripts.

Dataset-level composition of the stage bodies in
:mod:`ctas_ray.stages.rollup`:

  transcripts -> extract_channels -> groupby(conv_id, chunk)       # shuffle 1
              -> ConvChunkRollup (tier-1m partials + Gorilla blobs)
              -> tier 1m merge   (chunk-boundary re-merge)          # shuffle 2
              -> tier 1h merge   (from 1m partials)                 # small
              -> tier 1d merge   (from 1h partials)                 # smaller
              -> write_parquet per tier + manifest entries

Skew: giant conversations are sub-split by ``chunk = turn_idx // C``
inside the group KEY itself — the salted-hash handling mandated by
BASELINE.json north_rule. Chunk results re-merge exactly because every
per-bucket aggregate is an associative partial (stages/rollup.py).

Resume: each tier write appends a manifest entry; ``run_rollup`` with
the same ``out_dir`` skips tiers whose entry exists and whose input
fingerprint matches (resume-by-skip, S2).
"""

from __future__ import annotations

import functools
import hashlib
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..sources import read_parquet_clean

from ..config import RollupConfig
from ..state.manifest import ManifestWriter, load_completed, manifest_entry
from ..stages.rollup import (
    TIER_PARTIAL_COLUMNS,
    add_conv_salt,
    extract_channels,
    partition_cascade,
    partition_rollup,
    tier_name,
    tier_select,
    with_derived_stats,
)

__all__ = ["rollup_datasets", "run_rollup", "read_tier", "tier_name"]


def _stage0(transcripts: rd.Dataset, cfg: RollupConfig, verify_roundtrip: bool) -> rd.Dataset:
    """Ingest -> channel extraction -> salted-hash exchange ->
    vectorized per-partition rollup (tier-1 partials + Gorilla blobs)."""
    chan = transcripts.map_batches(
        functools.partial(
            extract_channels,
            chunk_turns=cfg.max_turns_per_chunk,
            salt_buckets=cfg.salt_buckets,
            keep_text=cfg.archive_text,
        ),
        batch_format="pyarrow",
    )
    return chan.groupby("part").map_groups(
        functools.partial(
            partition_rollup,
            tier1_s=cfg.tiers_s[0],
            with_codec=True,
            verify_roundtrip=verify_roundtrip,
            inline_tiers_s=tuple(cfg.tiers_s),
            with_text=cfg.archive_text,
            gapfill=(cfg.gap_fill_method, cfg.gap_fill_step_s)
            if cfg.gapfill_tiers else None,
            arrow_out=True,
        ),
        batch_format="pandas",
    )


def _sort_block_for_tier_write(t):
    """Bucket-major intra-block order before a tier parquet write:
    row-group min/max stats on ``bucket`` then satisfy time-range
    predicates, so read_tier(start_us/end_us) and the time-bounded
    tier analytics prune row groups at storage. Exactness is
    unaffected: every persisted-tier consumer re-sorts or groups
    (merge_tier_partials, partition_cascade, the hash queries).

    Only the kind='tier'/'t1' rows are reordered — blob/textblob rows
    carry large binary payloads that a whole-block take() would gather
    byte-for-byte for zero pruning benefit (their reads are keyed by
    conversation, not time). Kinds stay contiguous so the hive
    (kind, tier) partition split is unaffected."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    if os.environ.get("CTAS_RAY_TIER_WRITE_SORT") == "0":
        return t  # diagnostic kill-switch (A/B in BENCH protocols)
    if "bucket" not in t.column_names or t.num_rows <= 1:
        return t
    if "kind" in t.column_names:
        kind = t["kind"]
        if pa.types.is_dictionary(kind.type):
            kind = kind.cast(kind.type.value_type)
        is_tier = pc.is_in(
            kind, value_set=pa.array(["tier", "t1"], type=pa.string())
        )
        n_tier = pc.sum(pc.cast(is_tier, pa.int64())).as_py() or 0
        if n_tier == 0:
            return t
        if n_tier < t.num_rows:
            tier_part = t.filter(is_tier)
            rest = t.filter(pc.invert(is_tier))
            return pa.concat_tables(
                [_sort_block_for_tier_write(tier_part), rest],
                promote_options="default",
            )
    keys = [c for c in ("kind", "tier", "bucket") if c in t.column_names]
    cols = {}
    for c in keys:
        arr = t[c]
        if pa.types.is_dictionary(arr.type):  # sort keys: decode dicts
            arr = arr.cast(arr.type.value_type)
        cols[c] = arr
    idx = pc.sort_indices(
        pa.table(cols), sort_keys=[(c, "ascending") for c in keys]
    )
    return t.take(idx)


def _cascade(partials: rd.Dataset, cfg: RollupConfig) -> rd.Dataset:
    """Conv-salted exchange -> ALL retention tiers in one partition pass
    (output has a ``tier`` column)."""
    salted = partials.map_batches(
        functools.partial(add_conv_salt, salt_buckets=cfg.salt_buckets),
        batch_format="pandas",
    )
    return salted.groupby("part").map_groups(
        functools.partial(partition_cascade, tiers_s=tuple(cfg.tiers_s)),
        batch_format="pandas",
    )


def rollup_datasets(
    transcripts: rd.Dataset,
    cfg: RollupConfig = RollupConfig(),
    verify_roundtrip: bool = False,
) -> dict[str, rd.Dataset]:
    """Build the lazy Dataset graph for all tiers + the codec blob table.

    Returns {"tier_1m": ds, "tier_1h": ds, "tier_1d": ds, "blobs": ds}.
    Nothing is executed until a consumer runs. NOTE: the tier datasets
    share lineage — consuming each separately re-executes the shared
    stages; use :func:`run_rollup` (checkpointed, single execution) for
    real runs.
    """
    grouped = _stage0(transcripts, cfg, verify_roundtrip)
    blobs = grouped.map_batches(
        functools.partial(tier_select, kind="blob"), batch_format="pyarrow"
    )
    # single-chunk conversations were cascaded inline (kind='tier');
    # only multi-chunk leftovers go through the merge exchange
    inline = grouped.map_batches(
        functools.partial(_select_kind_tier), batch_format="pandas"
    )
    partials = grouped.map_batches(
        functools.partial(tier_select, kind="t1"), batch_format="pyarrow"
    )
    cascade = _cascade(partials, cfg).union(inline)
    out: dict[str, rd.Dataset] = {"blobs": blobs}
    for width in cfg.tiers_s:
        name = tier_name(width)
        out[f"tier_{name}"] = cascade.map_batches(
            functools.partial(_select_tier, name=name), batch_format="pandas"
        )
    return out


def _decat(df):
    """Decode Categorical columns (from dictionary-typed union blocks)
    to plain object/numpy dtypes at the in-memory API boundary."""
    import pandas as _pd

    for c in df.columns:
        if isinstance(df[c].dtype, _pd.CategoricalDtype):
            df[c] = df[c].astype(df[c].cat.categories.dtype)
    return df


def _select_kind_tier(batch):
    out = batch[batch["kind"] == "tier"]
    return _decat(out[TIER_PARTIAL_COLUMNS + ["tier"]].copy())


def _select_tier(batch, name: str):
    return _decat(batch[batch["tier"] == name].drop(columns=["tier"]).copy())


def _fingerprint(transcripts_path: str | None, cfg: RollupConfig) -> str:
    h = hashlib.sha256(repr((transcripts_path, cfg)).encode()).hexdigest()[:16]
    return h


def run_rollup(
    transcripts: rd.Dataset | None,
    out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    transcripts_path: str | None = None,
    verify_roundtrip: bool = False,
    grouped: rd.Dataset | None = None,
) -> dict[str, str]:
    """Execute and persist the whole cascade under ``out_dir``, with
    per-partition manifest entries (lineage + throughput).

    SINGLE-EXECUTION design, TWO exchanges total:

      stage0/   ingest + channel extraction + salted-hash partition
                exchange -> vectorized partition rollup (tier-1 partials
                + Gorilla blobs), checkpointed partitioned by ``kind``
      tiers/    conv-salted exchange -> partition_cascade computes ALL
                retention tiers from the tier-1 partials in one pass
                (higher tiers from lower-tier rows, never from raw),
                written partitioned by ``tier``

    Resume: a rerun with the same out_dir skips any step already in
    ``manifest.jsonl`` with a matching input fingerprint — kill the job
    after stage0 and the rerun rebuilds only the tiers, from disk.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_completed(manifest_path)
    fp = _fingerprint(transcripts_path, cfg)
    writer = ManifestWriter.remote(manifest_path)
    paths: dict[str, str] = {}

    def _record(name: str, path: str, wall: float) -> None:
        # row count straight from parquet footers: no Ray plan execution
        # (driver-serial cost matters at small per-core workloads)
        import pyarrow.parquet as pq

        files = [
            os.path.join(root, f)
            for root, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
        from concurrent.futures import ThreadPoolExecutor

        def _rows(f: str) -> int:
            return pq.ParquetFile(f).metadata.num_rows

        with ThreadPoolExecutor(max_workers=16) as pool:
            n = sum(pool.map(_rows, files))
        nbytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
        writer.append.remote(
            manifest_entry(
                partition_id=f"{name}:{fp}", rows_in=n, rows_out=n,
                nbytes=nbytes, wall_s=wall, fingerprint=fp,
                extra={"path": path},
            )
        )

    # --- stage 0: the one expensive execution, checkpointed.
    # ``grouped`` lets a caller supply a pre-fused union dataset (e.g.
    # the single-exchange events path) instead of the generic
    # transcript-input stage. ---
    stage0 = os.path.join(out_dir, "stage0")
    if f"stage0:{fp}" not in done:
        if grouped is None:
            grouped = _stage0(transcripts, cfg, verify_roundtrip)
        t0 = time.perf_counter()
        # partitioned by (kind, tier): inline-cascaded tier rows land in
        # their final tier layout IMMEDIATELY (kind=tier/tier=1m ...) so
        # the tiers step below never copies them — it only cascades the
        # (few) multi-chunk t1 leftovers. Non-tier kinds get the hive
        # null partition dir, which readers prune via columns=.
        # Blocks are sorted bucket-major first so each row group's
        # bucket min/max is tight — time-range predicates (read_tier
        # start/end_us, tier_gap_analysis since_us) then prune row
        # groups at storage instead of scan-and-filter.
        grouped.map_batches(
            _sort_block_for_tier_write, batch_format="pyarrow"
        ).write_parquet(
            stage0,
            partition_cols=["kind", "tier"],
            row_group_size=cfg.tier_row_group_rows,
        )
        _record("stage0", stage0, time.perf_counter() - t0)
    paths["blobs"] = os.path.join(stage0, "kind=blob")
    paths["stage0"] = stage0
    textblob_dir = os.path.join(stage0, "kind=textblob")
    if os.path.isdir(textblob_dir):
        paths["textblobs"] = textblob_dir

    # per-partition lineage rows emitted by the partition UDFs -> manifest
    pmeta_dir = os.path.join(stage0, "kind=pmeta")
    if f"pmeta:{fp}" not in done and os.path.isdir(pmeta_dir):
        import pyarrow.parquet as pq

        pmeta_files = [
            os.path.join(root, f)
            for root, _, fs in os.walk(pmeta_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
        pm = pa.concat_tables(
            [
                pq.read_table(f, columns=["part", "rows_in", "n_convs", "wall_s"])
                for f in pmeta_files
            ]
        ).to_pandas()
        entries = [
            manifest_entry(
                partition_id=f"part{int(r.part)}:{fp}",
                rows_in=int(r.rows_in),
                rows_out=int(r.rows_in),
                nbytes=0,
                wall_s=float(r.wall_s),
                fingerprint=fp,
                extra={"n_convs": int(r.n_convs), "stage": "stage0"},
            )
            for r in pm.itertuples()
        ]
        entries.append(
            manifest_entry(
                partition_id=f"pmeta:{fp}", rows_in=len(pm), rows_out=len(pm),
                nbytes=0, wall_s=0.0, fingerprint=fp,
            )
        )
        writer.append_many.remote(entries)

    # --- tiers: inline-cascaded rows ALREADY sit tier-partitioned under
    # stage0/kind=tier; only the (few) multi-chunk conversation partials
    # go through the merge exchange, into tiers/ ---
    tiers_dir = os.path.join(out_dir, "tiers")
    if f"tiers:{fp}" not in done:
        t1_dir = os.path.join(stage0, "kind=t1")
        t0 = time.perf_counter()
        if os.path.isdir(t1_dir):
            lower = read_parquet_clean(
                t1_dir, columns=TIER_PARTIAL_COLUMNS
            ).map_batches(_coerce_partial_types, batch_format="pyarrow")
            _cascade(lower, cfg).map_batches(
                _sort_block_for_tier_write, batch_format="pyarrow"
            ).write_parquet(
                tiers_dir,
                partition_cols=["tier"],
                row_group_size=cfg.tier_row_group_rows,
            )
            _record("tiers", tiers_dir, time.perf_counter() - t0)
        else:
            # nothing to merge: every conversation was inline-cascaded in
            # stage0 — record the inline tier partition as the tiers step
            _record(
                "tiers", os.path.join(stage0, "kind=tier"),
                time.perf_counter() - t0,
            )
    for width in cfg.tiers_s:
        paths[f"tier_{tier_name(width)}"] = _tier_paths(
            out_dir, tier_name(width)
        )
    ray.get(writer.flush.remote())
    return paths


def _coerce_partial_types(b):
    """Normalize partial dtypes after a parquet round-trip. Accepts an
    Arrow table (zero-copy casts, the hot tier-copy path) or a pandas
    frame (legacy callers)."""
    if isinstance(b, pa.Table):
        target = {
            **{c: pa.int64() for c in ("bucket", "count", "first_ts", "last_ts")},
            **{c: pa.float64() for c in ("sum", "min", "max", "sumsq",
                                          "first_val", "last_val")},
            # stage0 stores strings dictionary-encoded (wire-size win);
            # readers decode so downstream pandas never sees Categorical
            **{c: pa.string() for c in ("conv_id", "channel")},
        }
        for col, typ in target.items():
            i = b.schema.get_field_index(col)
            if i >= 0 and b.schema.field(i).type != typ:
                b = b.set_column(i, col, pc.cast(b[col], typ))
        return b
    import numpy as _np
    import pandas as _pd

    for col in ("bucket", "count", "first_ts", "last_ts"):
        b[col] = b[col].astype(_np.int64)
    for col in ("sum", "min", "max", "sumsq", "first_val", "last_val"):
        b[col] = b[col].astype(_np.float64)
    for col in ("conv_id", "channel"):
        if col in b.columns and isinstance(b[col].dtype, _pd.CategoricalDtype):
            b[col] = b[col].astype(object)
    return b


def run_rollup_events(
    sf_dir: str,
    out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    amplify: int = 1,
    verify_roundtrip: bool = False,
    user_filter_ref=None,
    events_paths: list[str] | None = None,
) -> dict[str, str]:
    """Single-exchange rollup straight from the events table (fused
    turn-derivation + channels + cascade + codec; see
    stages.rollup.fused_events_rollup).

    ``user_filter_ref``: optional ``ray.put`` handle to a sorted int64
    array of user ids; when set, only those conversations are rolled up
    (the incremental-ingest recompute path — see
    :func:`ingest_events_increment`). Applied BEFORE the exchange, so
    unaffected conversations never enter the shuffle.

    ``events_paths``: explicit parquet paths to read instead of
    ``{sf_dir}/events.parquet`` — the read-pruning hook: with a
    key-partitioned event store (``part=<uid %% salt_buckets>/``
    layout) the incremental path passes only the affected buckets'
    directories, so untouched history is never read at all."""
    import numpy as np
    import pandas as pd

    from ..stages.rollup import fused_events_rollup

    # read plain, then split into salt_buckets blocks with an explicit
    # repartition: override_num_blocks=K on a single small file makes
    # ONE read task yield K blocks through its streaming generator,
    # whose per-block backpressure handshake serializes the whole front
    # end (~55ms/block regardless of cluster size — measured 3.7s for
    # 64 blocks vs 0.9s via repartition at 32 cpus). At real scale the
    # input is many files and reads parallelize naturally; the
    # repartition is then a cheap block-count adjustment either way.
    ds = read_parquet_clean(
        events_paths if events_paths is not None else f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "props"],
    ).repartition(cfg.salt_buckets)

    buckets = np.int64(cfg.salt_buckets)
    max_user = 10_000_000

    def add_part(b: pa.Table) -> pa.Table:
        # project text -> text_len BEFORE the exchange: only 4 narrow
        # int columns enter the shuffle, never the strings — and keep
        # the blocks Arrow so the sort exchange moves zero-copy buffers.
        # Synthetic amplification happens HERE, after the projection:
        # utf8_length runs once per physical row and replicas tile the
        # int columns only (the previous pandas replicate stage pushed
        # amplify x the string objects through the heap just to project
        # them away one stage later — pure DRAM traffic).
        uid = pc.cast(b["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(b["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        tsv = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        tlen = pc.coalesce(
            pc.utf8_length(b["props"]), pa.scalar(0, pa.int32())
        ).to_numpy(zero_copy_only=False)
        if amplify > 1:
            offs = (np.arange(amplify, dtype=np.int64) * max_user)[:, None]
            uid = (uid[None, :] + offs).ravel()
            eid = np.tile(eid, amplify)
            tsv = np.tile(tsv, amplify)
            tlen = np.tile(tlen, amplify)
        if user_filter_ref is not None:
            keep = np.isin(uid, ray.get(user_filter_ref), assume_unique=False)
            uid, eid, tsv, tlen = uid[keep], eid[keep], tsv[keep], tlen[keep]
        # text_len stays int32 (utf8_length's native width) and part fits
        # int32: 32 B/row through the exchange instead of 40 — shuffle and
        # sort traffic is the scaling-limiting resource, not compute
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "ts_us": pa.array(tsv, type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "text_len": pa.array(tlen, type=pa.int32()),
                "part": pa.array((uid % buckets).astype(np.int32)),
            }
        )

    # hash-repartition by salt bucket instead of groupby().map_groups():
    # the partition body lexsorts by conversation anyway, so the global
    # SORT exchange the groupby would run is pure wasted memory traffic
    # — a hash exchange moves each row once with no compare passes. A
    # block may hold several salt buckets (hash collisions); the body
    # handles mixed parts and emits exact per-bucket lineage.
    body = functools.partial(
        fused_events_rollup,
        tier1_s=cfg.tiers_s[0],
        with_codec=True,
        verify_roundtrip=verify_roundtrip,
        inline_tiers_s=tuple(cfg.tiers_s),
        gapfill=(cfg.gap_fill_method, cfg.gap_fill_step_s)
        if cfg.gapfill_tiers else None,
    )
    # NOTE: a hash-shuffled exchange (_hash_shuffle_ctx) was measured
    # against this sort-based groupby at 15M turns: the hash backend's
    # aggregator actors cost more than the sort saves at this block
    # shape (13.5s vs 11.4s at 8 cpus), so the sort exchange ships.
    projected = ds.map_batches(add_part, batch_format="pyarrow")
    grouped = projected.groupby("part").map_groups(
        body, batch_format="pyarrow"
    )
    return run_rollup(
        None,
        out_dir,
        cfg,
        transcripts_path=f"{sf_dir}#amplify={amplify}",
        grouped=grouped,
    )


def apply_retention(
    out_dir: str,
    now_us: int,
    policy: dict[str, float | None],
) -> dict[str, int]:
    """[graft] Retention enforcement: drop tier parquet files whose
    entire bucket range is older than the tier's max age.

    ``policy``: tier name ('tier_1m', ...) -> max age in SECONDS
    (None = keep forever). File-granular: a file is deleted only when
    its parquet column statistics prove max(bucket) < cutoff, so no
    surviving bucket is ever touched (safe under resume). Deletions are
    recorded in the manifest. Returns {tier: files_deleted}.

    This is the classic retention story of a downsampling store: raw
    1m points age out quickly, 1h lives longer, 1d forever.
    """
    import pyarrow.parquet as pq

    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    writer = ManifestWriter.remote(manifest_path)
    deleted: dict[str, int] = {}
    for tier, max_age_s in policy.items():
        deleted[tier] = 0
        if max_age_s is None:
            continue
        cutoff = now_us - int(max_age_s * 1_000_000)
        tier_files = [
            (tdir, fname)
            for tdir in _tier_paths(out_dir, tier.removeprefix("tier_"))
            for fname in sorted(os.listdir(tdir))
        ]
        for tdir, fname in tier_files:
            fpath = os.path.join(tdir, fname)
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(fpath).metadata
            max_bucket = None
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "bucket" and col.statistics is not None:
                        v = col.statistics.max
                        max_bucket = v if max_bucket is None else max(max_bucket, v)
            if max_bucket is not None and max_bucket < cutoff:
                os.remove(fpath)
                deleted[tier] += 1
                writer.append.remote(
                    manifest_entry(
                        partition_id=f"retention:{tier}:{fname}",
                        rows_in=0, rows_out=0, nbytes=0, wall_s=0.0,
                        fingerprint="retention",
                        extra={"cutoff_us": cutoff, "max_bucket": int(max_bucket)},
                    )
                )
    ray.get(writer.flush.remote())
    return deleted


def _tier_paths(out_dir: str, name: str) -> list[str]:
    """Existing directories holding a tier's rows: the stage0 inline
    partition plus the multi-chunk merge output (either may be absent —
    e.g. the events path usually has no multi-chunk leftovers)."""
    cands = [
        os.path.join(out_dir, "stage0", "kind=tier", f"tier={name}"),
        os.path.join(out_dir, "tiers", f"tier={name}"),
    ]
    return [p for p in cands if os.path.isdir(p)]


def read_tier(
    out_dir: str,
    tier: str,
    derived: bool = True,
    start_us: int | None = None,
    end_us: int | None = None,
) -> rd.Dataset:
    """Read a persisted tier (``tier`` like 'tier_1m'); optionally append
    derived mean/sd columns (exactness: derived at read from the
    partials, A10).

    ``start_us``/``end_us`` prune at the READ: the bucket range becomes
    a parquet row-group filter so out-of-range data never leaves
    storage (half-open [start, end))."""
    import pyarrow.compute as pc

    path = _tier_paths(out_dir, tier.removeprefix("tier_"))
    flt = None
    if start_us is not None:
        flt = pc.field("bucket") >= start_us
    if end_us is not None:
        upper = pc.field("bucket") < end_us
        flt = upper if flt is None else flt & upper
    ds = read_parquet_clean(path, columns=TIER_PARTIAL_COLUMNS, filter=flt).map_batches(
        _coerce_partial_types, batch_format="pyarrow"
    )
    if derived:
        ds = ds.map_batches(with_derived_stats, batch_format="pyarrow")
    return ds


BLOB_COLUMNS = [
    "conv_id", "channel", "chunk", "n", "blob",
    "first_ts", "last_ts", "roundtrip_ok",
]


def ingest_events_increment(
    full_sf_dir: str,
    increment_path: str,
    prior_paths: dict[str, str],
    out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    materialize: bool = False,
    partitioned_events_dir: str | None = None,
) -> dict[str, str]:
    """[graft] Incremental / late-data ingest: fold a new batch of
    events into an EXISTING rollup without recomputing untouched
    conversations — the continuous-aggregate refresh story of a
    downsampling store (the reference's operating model is a full
    daily re-run, paper p.5; here only affected partitions re-run).

    Derived channels make per-bucket merge insufficient for exactness:
    a late turn changes the NEXT turn's latency, and the Gorilla blob
    of every chunk it lands in. So the refresh granularity is the
    CONVERSATION (delete + replace):

      1. affected = distinct user ids in the increment (driver-side
         unique of one int64 column of the increment — bounded by the
         increment, never by history),
      2. recompute those conversations from FULL history via the normal
         fused path with a pre-exchange filter (unaffected rows never
         enter the shuffle),
      3. carry forward every other conversation's tier/blob rows
         untouched, union with the recomputed rows, write.

    Two output modes:

    * ``materialize=False`` (default, the SCALE path): write ONLY the
      recomputed delta plus a tombstone table; nothing of the prior
      rollup is read or rewritten. Readers resolve the view with
      :func:`read_increment_tier` / :func:`read_increment_blobs`
      (prior minus tombstoned conversations, union delta) — classic
      merge-on-read. With ``partitioned_events_dir`` (a
      ``part=<uid %% salt_buckets>/`` event store) the recompute READ
      prunes to the affected buckets, so ingest cost is proportional
      to the increment's buckets, not to history: measured at a
      5M-turn history with a 2-of-64-bucket late increment, ingest is
      3.6 s vs 4.8 s from-scratch at 32 cpus — and the gap widens
      linearly with history size since from-scratch reads and shuffles
      everything while ingest touches 2/64 of it (dominated here by
      fixed pipeline costs). Chained increments resolve recursively.
    * ``materialize=True``: additionally rewrite self-contained tier /
      blob parquet (prior carry-forward union delta) — simple output,
      but it copies the whole store and is only sensible for compaction
      cadence, not per-increment.

    ``full_sf_dir`` must hold the merged history (old events plus the
    increment) as events.parquet; ``increment_path`` is the new-batch
    parquet. Returns the same ``paths`` mapping as
    :func:`run_rollup_events` (for merge-on-read mode the tier values
    are view specs consumed by the read functions). Both modes are
    bit-for-bit equal to a from-scratch rollup of the full history
    (pinned by tests/test_incremental_ingest.py)."""
    import json

    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    # 1. affected conversations (increment keys only)
    inc_uid = read_parquet_clean(increment_path, columns=["user_id"])

    def _uniq(b: pd.DataFrame) -> pd.DataFrame:
        if "user_id" not in b.columns:  # empty-batch guard
            return pd.DataFrame({"user_id": np.empty(0, np.int64)})
        return pd.DataFrame({"user_id": np.unique(b["user_id"].to_numpy(np.int64))})

    parts = inc_uid.map_batches(_uniq, batch_format="pandas").to_pandas()
    affected_uids = (
        np.unique(parts["user_id"].to_numpy(np.int64))
        if "user_id" in parts.columns  # a 0-row Dataset collects columnless
        else np.empty(0, np.int64)
    )
    affected_convs = set("u" + pd.Series(affected_uids).astype(str))
    uid_ref = ray.put(affected_uids)
    conv_ref = ray.put(affected_convs)

    # empty increment: nothing to recompute — the view is the prior
    # rollup verbatim (delta=None, empty tombstones)
    if len(affected_uids) == 0:
        import json as _json

        tomb_path = os.path.join(out_dir, "tombstones.parquet")
        pd.DataFrame({"conv_id": pd.Series([], dtype=str)}).to_parquet(tomb_path)
        view = {
            "prior": {k: v for k, v in prior_paths.items()
                      if k == "blobs" or k.startswith("tier_")},
            "delta": None,
            "tombstones": tomb_path,
        }
        with open(os.path.join(out_dir, "increment.json"), "w") as f:
            _json.dump(view, f, indent=1)
        return {k: {"increment_view": out_dir, "key": k} for k in view["prior"]}

    # 2. recompute ONLY affected conversations from full history.
    # With a key-partitioned store, PRUNE AT THE READ: only the
    # affected buckets' directories are opened — untouched history
    # never leaves storage (cost O(increment's buckets), not O(history))
    events_paths = None
    if partitioned_events_dir is not None:
        buckets = sorted({int(u) % cfg.salt_buckets for u in affected_uids})
        # expand to the parquet FILES: ray.data.read_parquet accepts a
        # list of files but not a list of hive directories
        events_paths = [
            os.path.join(root, f)
            for b in buckets
            for root, _dirs, files in os.walk(
                os.path.join(partitioned_events_dir, f"part={b}")
            )
            for f in sorted(files)
            if f.endswith(".parquet")
        ]
    recompute_dir = os.path.join(out_dir, "recompute")
    new_paths = run_rollup_events(
        full_sf_dir, recompute_dir, cfg, user_filter_ref=uid_ref,
        events_paths=events_paths,
    )

    def _keep_unaffected(b: pd.DataFrame) -> pd.DataFrame:
        return b[~b["conv_id"].isin(ray.get(conv_ref))]

    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    writer = ManifestWriter.remote(manifest_path)
    paths: dict[str, str] = {}
    t0 = time.perf_counter()

    # 3a. merge-on-read view: tombstones + a view spec; the prior
    # rollup is NOT touched (O(increment) ingest, the scale path)
    tomb_path = os.path.join(out_dir, "tombstones.parquet")
    pd.DataFrame({"conv_id": sorted(affected_convs)}).to_parquet(tomb_path)
    view = {
        "prior": {k: v for k, v in prior_paths.items()
                  if k == "blobs" or k.startswith("tier_")},
        "delta": {k: v for k, v in new_paths.items()
                  if k == "blobs" or k.startswith("tier_")},
        "tombstones": tomb_path,
    }
    with open(os.path.join(out_dir, "increment.json"), "w") as f:
        json.dump(view, f, indent=1)
    for k in view["delta"]:
        paths[k] = {"increment_view": out_dir, "key": k}

    # 3b. optional compaction: rewrite a self-contained store
    if materialize:
        for width in cfg.tiers_s:
            name = tier_name(width)
            prior = prior_paths[f"tier_{name}"]
            keep = read_parquet_clean(
                prior, columns=TIER_PARTIAL_COLUMNS
            ).map_batches(_coerce_partial_types, batch_format="pyarrow").map_batches(
                _keep_unaffected, batch_format="pandas"
            )
            fresh = read_parquet_clean(
                new_paths[f"tier_{name}"], columns=TIER_PARTIAL_COLUMNS
            ).map_batches(_coerce_partial_types, batch_format="pyarrow")
            dest = os.path.join(out_dir, "tiers", f"tier={name}")
            keep.union(fresh).write_parquet(dest)
            paths[f"tier_{name}"] = [dest]

        prior_blobs = read_parquet_clean(
            prior_paths["blobs"], columns=BLOB_COLUMNS
        ).map_batches(_keep_unaffected, batch_format="pandas")
        fresh_blobs = read_parquet_clean(new_paths["blobs"], columns=BLOB_COLUMNS)
        blob_dest = os.path.join(out_dir, "blobs")
        prior_blobs.union(fresh_blobs).write_parquet(blob_dest)
        paths["blobs"] = blob_dest

    writer.append.remote(
        manifest_entry(
            partition_id=f"increment:{_fingerprint(increment_path, cfg)}",
            rows_in=int(len(affected_uids)), rows_out=int(len(affected_uids)),
            nbytes=0, wall_s=time.perf_counter() - t0,
            fingerprint=_fingerprint(full_sf_dir, cfg),
            extra={"affected_conversations": int(len(affected_uids)),
                   "recompute_dir": recompute_dir},
        )
    )
    ray.get(writer.flush.remote())
    return paths


def _resolve_increment(spec, columns):
    """Resolve a merge-on-read view spec (possibly CHAINED: the prior
    may itself be an increment view) into a lazy Dataset: prior minus
    tombstoned conversations, union delta."""
    import json

    import pandas as pd

    if isinstance(spec, dict) and "increment_view" in spec:
        out_dir, key = spec["increment_view"], spec["key"]
        with open(os.path.join(out_dir, "increment.json")) as f:
            view = json.load(f)
        tomb = set(pd.read_parquet(view["tombstones"])["conv_id"])
        tomb_ref = ray.put(tomb)

        def drop(b: pd.DataFrame) -> pd.DataFrame:
            return b[~b["conv_id"].isin(ray.get(tomb_ref))]

        prior = _resolve_increment(view["prior"][key], columns).map_batches(
            drop, batch_format="pandas"
        )
        if view["delta"] is None:  # empty increment: prior verbatim
            return prior
        delta = _resolve_increment(view["delta"][key], columns)
        return prior.union(delta)
    return read_parquet_clean(spec, columns=columns)


def read_increment_tier(paths: dict, tier: str) -> rd.Dataset:
    """Merge-on-read view of a tier after :func:`ingest_events_increment`
    (``materialize=False``): lazy, nothing rewritten, chains resolve
    recursively. ``tier`` like 'tier_1m'."""
    ds = _resolve_increment(paths[tier], TIER_PARTIAL_COLUMNS)
    return ds.map_batches(_coerce_partial_types, batch_format="pyarrow")


def read_increment_blobs(paths: dict) -> rd.Dataset:
    return _resolve_increment(paths["blobs"], BLOB_COLUMNS)


def read_tier_asof(paths: dict, tier: str, *, back: int = 0) -> rd.Dataset:
    """[graft] Time-travel read: resolve a tier as of ``back`` ingests
    ago (``back=0`` is the current view). Merge-on-read ingest never
    rewrites the prior store, so the increment chain doubles as a
    snapshot log — walking ``back`` prior-links recovers any earlier
    version with zero data copied. A reader can therefore pin a
    version while ingest keeps appending (snapshot isolation); walking
    past the chain's origin raises."""
    import json

    if not tier.startswith("tier_"):
        raise ValueError(
            f"read_tier_asof projects tier partial columns and only accepts "
            f"tier keys (got {tier!r}); use read_increment_blobs for 'blobs'"
        )
    spec = paths[tier]
    for _ in range(back):
        if not (isinstance(spec, dict) and "increment_view" in spec):
            raise ValueError(
                f"lineage chain for {tier} has fewer than {back} snapshots"
            )
        with open(os.path.join(spec["increment_view"], "increment.json")) as f:
            view = json.load(f)
        spec = view["prior"][spec["key"]]
    ds = _resolve_increment(spec, TIER_PARTIAL_COLUMNS)
    return ds.map_batches(_coerce_partial_types, batch_format="pyarrow")


def route_tier(resolution_s: int, cfg: RollupConfig = RollupConfig()) -> str:
    """[graft] Tier router: the coarsest persisted tier whose width
    divides the requested resolution — the rule that makes a
    downsampling store answer a 2h query from the 1h tier instead of
    re-aggregating 120x more 1m rows (or 7200x more raw points)."""
    fits = [w for w in cfg.tiers_s if resolution_s % w == 0]
    if not fits:
        raise ValueError(
            f"no persisted tier divides resolution {resolution_s}s "
            f"(tiers: {sorted(cfg.tiers_s)})"
        )
    return f"tier_{tier_name(max(fits))}"


def read_rollup_at_resolution(
    out_dir: str,
    resolution_s: int,
    cfg: RollupConfig = RollupConfig(),
    start_us: int | None = None,
    end_us: int | None = None,
) -> rd.Dataset:
    """[graft] Resolution-routed tier read: route to the coarsest
    dividing tier, prune the bucket range at the read, then re-bucket
    the tier partials to the requested resolution. Exact for every
    output column: sums/counts/min/max merge associatively, and
    first/last come from the earliest/latest contributing bucket —
    whose within-bucket winner the tier build already resolved by
    (ts, turn_ix). A 2h query therefore touches 1/120th of the rows a
    1m read would, and none of the raw events."""
    import numpy as np
    import pandas as pd

    tier = route_tier(resolution_s, cfg)
    width_us = resolution_s * 1_000_000

    def rebucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["conv_id", "channel", "bucket"], kind="mergesort")
        g["bucket"] = (g["bucket"].to_numpy(np.int64) // width_us) * width_us
        agg = g.groupby(["conv_id", "channel", "bucket"], sort=False).agg(
            count=("count", "sum"),
            sum=("sum", "sum"),
            min=("min", "min"),
            max=("max", "max"),
            first_val=("first_val", "first"),  # earliest contributing bucket
            last_val=("last_val", "last"),     # latest contributing bucket
        )
        return agg.reset_index()

    ds = read_tier(out_dir, tier, derived=False,
                   start_us=start_us, end_us=end_us)

    def add_part(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["part"] = (
            pd.util.hash_pandas_object(b["conv_id"], index=False).to_numpy(
                np.uint64
            )
            % np.uint64(32)
        ).astype(np.int64)
        return b

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda g: rebucket(g.drop(columns=["part"])), batch_format="pandas"
        )
    )


def referenced_data_files(paths: dict) -> set[str]:
    """Every parquet data file reachable from a ``paths`` mapping —
    plain tier/blob paths, and merge-on-read increment chains walked
    recursively through ``increment.json`` (prior AND delta branches of
    every key, plus tombstones). The reachability set that
    :func:`gc_orphan_files` keeps."""
    import json

    out: set[str] = set()
    seen_views: set[str] = set()

    def mark_path(p) -> None:
        if isinstance(p, (list, tuple)):
            for x in p:
                mark_path(x)
            return
        if not isinstance(p, str):
            return
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if f.endswith(".parquet"):
                        out.add(os.path.realpath(os.path.join(root, f)))
        elif os.path.isfile(p) and p.endswith(".parquet"):
            out.add(os.path.realpath(p))

    def walk(spec) -> None:
        if isinstance(spec, dict) and "increment_view" in spec:
            view_dir = spec["increment_view"]
            if view_dir in seen_views:
                return
            seen_views.add(view_dir)
            with open(os.path.join(view_dir, "increment.json")) as f:
                view = json.load(f)
            mark_path(view.get("tombstones"))
            for branch in ("prior", "delta"):
                b = view.get(branch)
                if b is None:
                    continue
                for sub in b.values():
                    walk(sub)
            # a compacted (materialize=True) store in the same view dir
            mark_path(os.path.join(view_dir, "tiers"))
            mark_path(os.path.join(view_dir, "blobs"))
        else:
            mark_path(spec)

    for spec in paths.values():
        walk(spec)
    return out


def gc_orphan_files(
    paths: dict, roots: list[str], *, dry_run: bool = False
) -> list[str]:
    """[graft] Orphan-data-file GC over a tier store (the lakehouse
    ``remove_orphan_files`` maintenance op): delete every ``*.parquet``
    under ``roots`` that is NOT reachable from the current ``paths``
    view — aborted recomputes, superseded materializations, stray
    exports. Only data files are candidates; metadata
    (``manifest.jsonl``, ``increment.json``, tombstones) is never
    touched, and reachability walks the FULL increment chain, so every
    time-travel snapshot (`read_tier_asof`, any ``back``) still
    resolves after GC. Returns the orphan list (deleted unless
    ``dry_run``)."""
    keep = referenced_data_files(paths)
    orphans: list[str] = []
    for root in roots:
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                p = os.path.realpath(os.path.join(dirpath, f))
                if p not in keep:
                    orphans.append(p)
    if not dry_run:
        for p in orphans:
            os.remove(p)
    return sorted(orphans)


def forget_conversations(
    prior_paths: dict, conv_ids: list[str], out_dir: str
) -> dict:
    """[graft] Right-to-be-forgotten erase over the tier store: a
    pure-tombstone increment (delta=None) whose merge-on-read view is
    the prior store MINUS the named conversations — O(1) metadata
    write, nothing rewritten, effective immediately for every reader
    of the returned paths. Physical removal follows the store's normal
    lifecycle: a materialize/compaction pass drops the rows from the
    data files, and :func:`gc_orphan_files` reclaims superseded files.
    NOTE the retention caveat: prior snapshots (time travel into the
    pre-erase chain) still contain the data until compaction + GC —
    callers with hard-delete SLAs must run both."""
    import json

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    tomb_path = os.path.join(out_dir, "tombstones.parquet")
    pd.DataFrame({"conv_id": sorted(set(conv_ids))}).to_parquet(tomb_path)
    view = {
        "prior": {k: v for k, v in prior_paths.items()
                  if k == "blobs" or k.startswith("tier_")},
        "delta": None,
        "tombstones": tomb_path,
    }
    with open(os.path.join(out_dir, "increment.json"), "w") as f:
        json.dump(view, f, indent=1)
    return {k: {"increment_view": out_dir, "key": k} for k in view["prior"]}
