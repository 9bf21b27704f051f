"""Source helpers shared by all readers."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _schema_is_clean(sch: pa.Schema) -> bool:
    return sch.metadata is None and all(f.metadata is None for f in sch)


def _first_parquet_file(path) -> str | None:
    """Resolve one representative .parquet file to peek the schema from."""
    if isinstance(path, (list, tuple)):
        path = path[0] if path else None
    if not isinstance(path, str):
        return None
    if os.path.isfile(path):
        return path if path.endswith(".parquet") else None
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return None


def read_parquet_clean(path, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` that never emits pandas schema metadata.

    Parquet files written via pandas/pyarrow carry a schema-level
    metadata dict that makes ``pyarrow.Schema`` unhashable. Ray Data
    hashes schemas to dedup them when bundling read/shuffle outputs;
    unhashable schemas defeat that fast path and emit a "Failed to hash
    the schemas" warning per task. Three paths, cheapest wins:

    - the peeked file schema is already metadata-free (everything this
      engine writes): plain ``read_parquet``, no extra stage;
    - single-file read with dirty schema (driver-written testdata):
      pass a stripped ``schema=`` into the read so even the read op's
      own output blocks are clean (pruned to ``columns=`` when given,
      since Ray requires schema/columns agreement);
    - otherwise (partitioned dir with dirty files, exotic path types):
      fall back to a fused zero-copy strip map after the read.
    """
    peek = None if "schema" in kwargs else _first_parquet_file(path)
    if peek is not None:
        sch = pq.read_schema(peek)
        if _schema_is_clean(sch):
            return rd.read_parquet(path, **kwargs)
        if os.path.isfile(path if isinstance(path, str) else ""):
            cols = kwargs.get("columns")
            names = cols if cols is not None else sch.names
            sch = pa.schema([sch.field(c).remove_metadata() for c in names])
            return rd.read_parquet(path, schema=sch, **kwargs)
    ds = rd.read_parquet(path, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def arrow_clean(ds: rd.Dataset) -> rd.Dataset:
    """Strip schema metadata from a Dataset about to feed a hash
    exchange (join): an Arrow schema carrying a metadata dict is
    UNHASHABLE, which defeats Ray's schema-dedup fast path inside every
    HashShuffleAggregator reduce ('Failed to hash the schemas'
    warnings, one per reduce task). Pandas-format upstream stages pick
    up the ``b'pandas'`` metadata at the pandas->Arrow boundary, so any
    pandas-fed join input needs this. Metadata-only table rewrap —
    zero-copy."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
