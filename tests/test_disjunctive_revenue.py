"""Round-2 continuation: TPC-H Q19-shaped disjunctive-bracket revenue
— DuckDB oracle parity at sf0.001 plus a bracket-disjointness check."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_disjunctive_matches_oracle(ray_session):
    import __ray_entry__ as e
    from ctas_ray.pipelines.queries import tpch_disjunctive_revenue

    got = tpch_disjunctive_revenue(SF)
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.execute(e.oracle_sql()["tpch_disjunctive_revenue"]).fetchdf()
    assert len(got) == 1 and len(want) == 1
    for c in ("n_items", "revenue_e2"):
        assert int(got[c].iloc[0]) == int(want[c].iloc[0])
    # the three brackets partition on disjoint brand ranges, so the
    # total equals the sum of per-bracket counts
    per = con.execute(
        """
        WITH l AS (
          SELECT l_partkey,
                 CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS q,
                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price
          FROM lineitem
        ),
        j AS (
          SELECT price,
                 CAST(REPLACE(p_brand, 'Brand#', '') AS BIGINT) AS kb,
                 CAST(p_size AS BIGINT) AS ks, q
          FROM l JOIN part ON p_partkey = l_partkey
        )
        SELECT
          SUM(CASE WHEN kb <= 10 AND ks BETWEEN 1 AND 15
                    AND q BETWEEN 100 AND 1100 THEN 1 ELSE 0 END) AS b1,
          SUM(CASE WHEN kb > 10 AND kb <= 20 AND ks BETWEEN 16 AND 30
                    AND q BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END) AS b2,
          SUM(CASE WHEN kb > 20 AND ks BETWEEN 31 AND 50
                    AND q BETWEEN 2000 AND 3000 THEN 1 ELSE 0 END) AS b3
        FROM j
        """
    ).fetchdf()
    assert int(per[["b1", "b2", "b3"]].sum(axis=1).iloc[0]) == int(
        got["n_items"].iloc[0]
    )
