"""Self-check of the driver contract: runs every queries() entry at the
given sf_dir and compares against oracle_sql() via DuckDB the way the
driver does (row count + schema + order-insensitive value hash).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canonical(ray_df), canonical(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind != bv.dtype.kind:
                # the driver's value hash may be dtype-sensitive:
                # int64-vs-float64 passes allclose here but is a risk
                problems.append(
                    f"DTYPE column {c}: ray={av.dtype} sql={bv.dtype}"
                )
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = (av == bv).all()
            if not ok:
                bad = np.nonzero(~(av == bv) if av.dtype.kind != "f" else ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True))[0][:3]
                problems.append(f"values differ in column {c}: rows {bad.tolist()} ray={av[bad]} sql={bv[bad]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    # cap the ORACLE's memory and let it spill: a bounded DuckDB must
    # spill to disk instead of OOM-killing the box. 80GB: the heavy
    # sf0.1 oracles (ngram self-join ~1.5e9 intermediate rows) run
    # IN-MEMORY in seconds at this budget, while a 56GB cap pushed the
    # same join into a pathological out-of-core path that wrote >70GB
    # of spill; the disk remains the backstop for anything bigger
    con.execute("SET memory_limit='90GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows)")
            continue
        try:
            sql_df = con.execute(sqls[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(ray_df)} rows match")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
