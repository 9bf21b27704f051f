"""Gap-fill wired into the rollup tiers (SURVEY F10 placement,
VERDICT r01 item 5): tier-1m computed from the LOCF/linear grid.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from ctas_ray.config import RollupConfig  # noqa: E402


def _tiny_events(tmp: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    n = 400
    ts = (
        pd.to_datetime("2024-03-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 3600 * 4, n)), "s")
    ).astype("datetime64[us]")  # engine contract: timestamp[us] like testdata
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(1, 9, n).astype(np.int64),
            "event_type": "e",
            "value": rng.normal(size=n),
            "props": ["x" * int(k) for k in rng.integers(1, 50, n)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp, "events.parquet"))
    return tmp


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_gapfilled_tier_matches_duckdb(ray_session, method):
    import ray.data as rd

    from ctas_ray.pipelines.rollup import run_rollup_events

    with tempfile.TemporaryDirectory() as tmp, tempfile.TemporaryDirectory() as out:
        _tiny_events(tmp)
        paths = run_rollup_events(
            tmp, out,
            RollupConfig(gapfill_tiers=True, gap_fill_method=method,
                         gap_fill_step_s=15),
        )
        t = rd.read_parquet(paths["tier_1m"]).to_pandas()
        got = pd.DataFrame(
            {
                "conv_id": t["conv_id"],
                "channel": t["channel"],
                "bucket": t["bucket"].astype(np.int64),
                "n": t["count"].astype(np.int64),
                "sum_v": t["sum"].astype(np.float64),
                "first_v": t["first_val"].astype(np.float64),
                "last_v": t["last_val"].astype(np.float64),
            }
        ).sort_values(["conv_id", "channel", "bucket"]).reset_index(drop=True)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')"
        )
        fill_expr = (
            "p.v" if method == "locf"
            else "CASE WHEN n.ts_us = p.ts_us THEN p.v ELSE p.v + (n.v - p.v) / "
                 "CAST(n.ts_us - p.ts_us AS DOUBLE) * CAST(g.grid_ts - p.ts_us AS DOUBLE) END"
        )
        extra_join = (
            "" if method == "locf"
            else "ASOF JOIN points n ON g.conv_id = n.conv_id AND "
                 "g.channel = n.channel AND g.grid_ts <= n.ts_us"
        )
        want = con.execute(f"""
        WITH turns AS (
          SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
                 epoch_us(ts) AS ts_us,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_ix,
                 CAST(COALESCE(LENGTH(props), 0) AS DOUBLE) AS text_len,
                 CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS turn_latency_us
          FROM events
        ),
        chan AS (
          SELECT conv_id, ts_us, turn_ix, 'text_len' AS channel, text_len AS v FROM turns
          UNION ALL
          SELECT conv_id, ts_us, turn_ix, 'turn_latency_us', turn_latency_us
          FROM turns WHERE turn_latency_us IS NOT NULL
        ),
        points AS (
          SELECT conv_id, channel, ts_us, arg_max(v, turn_ix) AS v
          FROM chan GROUP BY 1, 2, 3
        ),
        bounds AS (
          SELECT conv_id, channel,
                 ((MIN(ts_us) + 14999999) // 15000000) * 15000000 AS gstart,
                 (MAX(ts_us) // 15000000) * 15000000 AS gend
          FROM points GROUP BY 1, 2
        ),
        grid AS (
          SELECT conv_id, channel,
                 UNNEST(generate_series(gstart, gend, 15000000)) AS grid_ts
          FROM bounds WHERE gend >= gstart
        ),
        fills AS (
          SELECT g.conv_id, g.channel, g.grid_ts, {fill_expr} AS v
          FROM grid g
          ASOF JOIN points p ON g.conv_id = p.conv_id AND g.channel = p.channel
           AND g.grid_ts >= p.ts_us
          {extra_join}
        )
        SELECT conv_id, channel, (grid_ts // 60000000) * 60000000 AS bucket,
               COUNT(*) AS n,
               SUM(v) AS sum_v,
               arg_min(v, grid_ts) AS first_v,
               arg_max(v, grid_ts) AS last_v
        FROM fills GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """).df()
    # sums compare with relative tolerance: linear interpolation produces
    # rationals (thirds etc.) whose sums differ by 1 ulp between
    # np.add.reduceat and DuckDB SUM ordering
    for c in ("conv_id", "channel", "bucket", "n"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("sum_v", "first_v", "last_v"):
        assert np.allclose(got[c], want[c], rtol=1e-9, atol=1e-9), c


def test_gapfill_requires_inline_tiers():
    from ctas_ray.stages.rollup import partition_rollup

    df = pd.DataFrame(
        {
            "conv_id": ["a"], "turn_idx": [0], "ts_us": [0],
            "text_len": [3], "chunk": [0], "carry": [np.int8(0)],
        }
    )
    with pytest.raises(ValueError):
        partition_rollup(df, inline_tiers_s=None, gapfill=("locf", 15))
