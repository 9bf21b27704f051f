"""Round-2 continuation batch 15: Heaps'-law vocabulary growth and
char-class composition — DuckDB oracle parity at sf0.001 plus
conservation invariants."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    want = want[list(got.columns)]
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert g.dtype.kind == w.dtype.kind, (c, g.dtype, w.dtype)
        assert (g == w).all(), (c, g[g != w][:3], w[g != w][:3])


def test_vocab_growth_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import vocab_growth_curve

    got = vocab_growth_curve(SF)
    want = _oracle("vocab_growth_curve")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # final cumulative equals the true global vocabulary size
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    vocab = set()
    for s in docs["text"]:
        vocab.update(str(s).split())
    assert got["cum_vocab"].iloc[-1] == len(vocab)
    assert (np.diff(got["cum_vocab"].to_numpy()) > 0).all()


def test_charclass_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import text_charclass_profile

    got = text_charclass_profile(SF)
    want = _oracle("text_charclass_profile")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (
        got["n_digits"] + got["n_upper"] + got["n_spaces"] <= got["n_chars"]
    ).all()
