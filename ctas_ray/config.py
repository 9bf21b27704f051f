"""Study configuration — the scalar arguments of ``process_a_study``
(R/ctas.R:29-42) plus engine knobs with no reference equivalent [graft].
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .schemas import VALID_FEATURES, VALID_SITE_SCORING, SchemaError

ALL_FEATURES = (
    "autocorr;average;own_site_simil_score;sd;unique_value_count_relative;range;lof"
)


@dataclass(frozen=True)
class StudyConfig:
    """Defaults applied per-parameter when the parameter table has NA
    (R/ctas.R:54-61), plus validation rules from check_input_data."""

    features: str = ALL_FEATURES  # ';'-packed like the reference
    min_timepoints_per_series: float = 3
    min_subjects_per_series: float = 3
    max_share_missing: float = 0.5
    generate_change_from_baseline: bool = False
    autogenerate_timeseries: bool | str = True  # True|False|'consecutive'|'adaptive'
    optimize_sites_and_patients: bool = False
    site_scoring_method: str = "ks"
    padjust_method: str = "fdr"
    # [graft] engine knobs
    ks_jitter_sd: float = 1e-5  # R/ctas.R:304; 0 disables for bit-exact tests
    ks_jitter_seed: int | None = 42  # reference is unseeded; we are deterministic
    # the reference's scalability cliff is the O(n^2) subject-distance
    # matrix per series (R/ctas.R:604). We hard-cap it: series with more
    # eligible subjects than this skip lof/own_site_simil_score (emitting
    # no rows, like the reference's NA-dist path) instead of OOMing a
    # worker. 20k subjects ~ 3.2 GB distance matrix.
    max_subjects_for_pairwise: int = 20_000
    # physical-layout hint (bucketed-table style): the caller guarantees
    # every subject's measurement rows already live in ONE input block
    # (e.g. the table came off a subject-salted exchange). Planning then
    # runs both eligibility passes straight over the blocks with no salt
    # exchange. Safe default: False (generic inputs get the exchange).
    # HAZARD (ADVICE r3): this is a caller ASSERTION the engine cannot
    # verify — if Ray's dynamic block splitting (or the upstream writer)
    # cut a subject's rows across blocks, per-subject visit counts and
    # eligibility deltas are silently wrong. Set True only for tables
    # whose physical layout guarantees it; the default=False path now
    # self-checks its own exchange via per-batch salt spans and falls
    # back to per-group dispatch when a split is detected.
    data_subject_complete: bool = False
    # "svd" = prcomp-parity float PCA (production); "qpca" = the
    # deterministic integer power-iteration variant whose output is
    # hash-verifiable against a SQL oracle (functions/multivariate.py).
    # qpca is NOT SVD-interchangeable: with a small top eigengap its
    # fixed 24 power iterations may converge to a direction far from
    # the prcomp PC1 (|corr| ~0.6 observed) — keep "svd" for any screen
    # whose consumers expect prcomp-equivalent coordinates.
    pca_method: str = "svd"

    def __post_init__(self) -> None:
        from .functions.series import FEATURE_REGISTRY  # user extensions (§2.10)

        feats = set(self.features.split(";"))
        bad = feats - VALID_FEATURES - set(FEATURE_REGISTRY)
        if bad:
            raise SchemaError(f"unknown features: {sorted(bad)}")  # R/ctas.R:1161-1163
        if self.min_subjects_per_series < 2:
            # R/ctas.R:1173 + regression test test_process_a_study.R:194-224
            raise SchemaError("default_minimum_subjects_per_series must be >= 2")
        if not (0 <= self.max_share_missing <= 1):
            raise SchemaError("max_share_missing must be within [0, 1]")  # R/ctas.R:1168
        from .study_core import SCORING_REGISTRY

        if self.site_scoring_method not in VALID_SITE_SCORING | set(SCORING_REGISTRY):
            raise SchemaError(f"bad site_scoring_method: {self.site_scoring_method}")
        if self.autogenerate_timeseries not in (True, False, "consecutive", "adaptive"):
            raise SchemaError("autogenerate_timeseries must be bool|consecutive|adaptive")
        if self.pca_method not in ("svd", "qpca"):
            raise SchemaError("pca_method must be 'svd' or 'qpca'")

    @property
    def autogen_enabled(self) -> bool:
        return self.autogenerate_timeseries in (True, "consecutive", "adaptive")

    @property
    def autogen_type(self) -> str:
        # R/ctas.R:36-42: TRUE -> "consecutive"
        return (
            self.autogenerate_timeseries
            if isinstance(self.autogenerate_timeseries, str)
            else "consecutive"
        )


@dataclass(frozen=True)
class RollupConfig:
    """[graft] knobs for the rollup/downsample/retention engine."""

    channels: tuple[str, ...] = ("text_len", "turn_latency_s")
    tiers_s: tuple[int, ...] = (60, 3600, 86400)  # 1m -> 1h -> 1d
    gap_fill_method: str = "locf"  # or "linear"
    gap_fill_step_s: int = 60
    # F10 placement: regularise each complete series onto the gap-fill
    # grid BEFORE tier-1 aggregation (multi-chunk conversations fall
    # back to raw points, logged)
    gapfill_tiers: bool = False
    salt_buckets: int = 64  # salted-hash partition count for conv_id
    # parquet row-group size for tier writes: blocks are sorted
    # bucket-major before the write, so row-group min/max stats on
    # ``bucket`` satisfy time-range predicates (read_tier start/end_us
    # prunes row groups at storage). ~131k rows ~ 10 MB per group.
    tier_row_group_rows: int = 131_072
    max_turns_per_chunk: int = 100_000  # long-conv sub-split threshold
    rolling_window: int = 8  # rolling mean/sd window (turns)
    archive_text: bool = False  # per-turn text blocks (byte-exact codec)
