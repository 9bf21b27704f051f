"""Source helpers shared by all readers."""

from __future__ import annotations

import ray.data as rd


def read_parquet_clean(path, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` + drop the ``pandas`` schema metadata.

    Parquet files written via pandas/pyarrow carry a schema-level
    metadata dict that makes ``pyarrow.Schema`` unhashable. Ray Data's
    shuffle reducers hash schemas to dedup them before unification;
    unhashable schemas defeat that fast path and emit a "Failed to hash
    the schemas" warning per reduce task. Stripping the metadata is
    zero-copy and fuses with the read, so every downstream exchange
    sees hashable, dedupable schemas. Column pruning / row filters are
    still pushed into the read op (the strip is a separate fused map).
    """
    ds = rd.read_parquet(path, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
