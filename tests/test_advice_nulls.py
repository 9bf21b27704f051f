"""ADVICE r01 regressions: null-props / all-null-value consistency.

The driver fixtures contain no nulls, so these latent divergences are
pinned here on synthetic parquet with nulls planted.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _write_events(tmp: str, df: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp, "events.parquet"))
    return tmp


def _events_frame() -> pd.DataFrame:
    n = 24
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(n), "min"),
            "user_id": np.int64(1) + (np.arange(n, dtype=np.int64) % 3),
            "event_type": ["click"] * 12 + ["view"] * 12,
            # user 3 on 'view' has ALL-NULL values
            "value": [
                np.nan if (i >= 12 and i % 3 == 2) else float(i) for i in range(n)
            ],
            "props": [None if i % 5 == 0 else f"p{i}" for i in range(n)],
        }
    )


def test_null_props_text_len_zero(ray_session):
    from ctas_ray.sources.transcripts import transcripts_from_events

    with tempfile.TemporaryDirectory() as tmp:
        _write_events(tmp, _events_frame())
        tx = transcripts_from_events(tmp).to_pandas()
    # null props -> empty text (length 0), NOT the string 'None'
    assert (tx["text"] != "None").all()
    assert (tx["text"].str.len() == 0).sum() > 0


def test_eligibility_counts_emits_all_null_groups(ray_session):
    from ctas_ray.pipelines.queries import eligibility_counts

    with tempfile.TemporaryDirectory() as tmp:
        _write_events(tmp, _events_frame())
        got = eligibility_counts(tmp)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')"
        )
        want = con.execute(
            """SELECT event_type AS parameter_id, CAST(user_id AS VARCHAR) AS subject_id,
                      COUNT(value) AS n_measurements
               FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
        ).df()
    assert (got["n_measurements"] == 0).sum() == 1  # the all-null group is present
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
