"""Driver-contract consistency: every oracle key names a query, every
query is callable, and the rows-only remainder is the documented
non-SQL set (codec blob metadata, seeded RNG paths, media decode,
KS-p/PCA full-config screen variants)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

ROWS_ONLY_ALLOWED = {
    "codec_blobs",            # blob byte metadata (losslessness is
                              # hash-checked via codec_roundtrip_points)
    "media_features",         # binary WAV/BMP decode
    "study_screen_sitescores",  # KS p-values + lof/own-site (full config)
    "study_screen_features",    # float lof/own-site features
    "heavy_tokens_mg",          # Misra-Gries sketch (pytest pins the
                                # guarantee vs exact counts)
}


def test_every_oracle_key_is_a_query():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_rows_only_set_is_exactly_the_documented_one():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    rows_only = set(qs) - set(sqls)
    assert rows_only == ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only: {rows_only - ROWS_ONLY_ALLOWED}; "
        f"now-oracled but still listed: {ROWS_ONLY_ALLOWED - rows_only}"
    )


def test_queries_are_callables():
    import __ray_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name
