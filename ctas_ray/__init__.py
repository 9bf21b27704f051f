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
