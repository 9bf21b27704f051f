"""ctas_ray — a Ray-Data-native time-series rollup + downsample + retention
engine with the query/data-processing capabilities of IMPALA-Consortium/ctas.

Built from scratch on ``ray.data.Dataset`` pipelines (Arrow batches,
actor pools for stateful stages, explicit salted-hash partitioning).
The reference (read-only at /root/reference, R package "ctas" v0.4.0)
defines WHAT is computed — per-series feature extraction and site-bias
scoring over clinical-style timeseries (R/ctas.R) — while this package
defines HOW: streaming groupby-aggregate stages over Parquet transcript
tables, cascading 1m→1h→1d continuous aggregates, Gorilla XOR /
delta-of-delta compression, gap-fill, and checkpoint manifests.
"""

__version__ = "0.1.0"

# public API (lazy: importing ctas_ray must not pull Ray until needed)
from .config import RollupConfig, StudyConfig  # noqa: E402,F401
from .schemas import TRANSCRIPT_SCHEMA, SchemaError  # noqa: E402,F401


def __getattr__(name):  # PEP 562 lazy exports that need ray/ray.data
    if name == "process_a_study":
        from .oracle import process_a_study

        return process_a_study
    if name == "process_a_study_ray":
        from .pipelines.study import process_a_study_ray

        return process_a_study_ray
    if name in ("run_rollup", "run_rollup_events", "apply_retention", "read_tier"):
        from .pipelines import rollup

        return getattr(rollup, name)
    if name == "screen_transcripts":
        from .pipelines.transcript_screen import screen_transcripts

        return screen_transcripts
    raise AttributeError(name)
