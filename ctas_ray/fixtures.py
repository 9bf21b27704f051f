"""Deterministic synthetic fixtures.

Two families (FIXTURES.md):

A. the canonical transcript table (conv_id, turn_idx, role, text, tool, ts)
   with explicitly skewed conversation lengths (clipped Zipf) — the
   primary engine input per BASELINE.json input_hint;

B. a Python regeneration of the reference's seeded demo fixture
   (data-raw/ctas_data.R: 3 regions -> Pois(3) countries -> Pois(4)
   sites -> Pois(5) subjects -> Pois(20) timepoints, values
   N(subject_level ~ N(30,5), sd ~ U(1,10)), 30% knocked out to NA).
   Same distributions and hierarchy, numpy seeding (bit-identical to
   itself, statistically identical to the R fixture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "generate_transcripts",
    "generate_ctas_study",
    "transcripts_to_study_tables",
]

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["", "", "", "search", "python", "browser", "calculator"])
_WORDS = np.array(
    "the of and to in a is that for it as was with be by on not he this are or "
    "his from at which but have an had they you were their one all we can her "
    "has there been if more when will would who so no".split()
)


def generate_transcripts(
    n_conv: int = 200,
    seed: int = 42,
    start_us: int = 1_700_000_000_000_000,
    zipf_a: float = 1.6,
    max_turns: int = 2000,
) -> pa.Table:
    """Deterministic transcript table; turns per conv ~ clipped Zipf
    (skew: some convs 10-100x the median), inter-turn gaps ~ lognormal
    seconds with occasional multi-hour gaps, text = seeded token soup."""
    rng = np.random.default_rng(seed)
    n_turns = np.minimum(3 + rng.zipf(zipf_a, size=n_conv), max_turns)
    total = int(n_turns.sum())
    conv_ids = np.repeat([f"c{i:06d}" for i in range(n_conv)], n_turns)
    turn_idx = np.concatenate([np.arange(n) for n in n_turns]).astype(np.int32)
    # gaps: lognormal seconds, 1% multi-hour
    gaps_s = rng.lognormal(mean=2.5, sigma=1.2, size=total)
    long_gap = rng.random(total) < 0.01
    gaps_s[long_gap] *= 500.0
    gaps_us = (gaps_s * 1e6).astype(np.int64)
    conv_starts = start_us + (rng.integers(0, 90 * 86400, size=n_conv) * 1_000_000)
    ts = np.empty(total, dtype=np.int64)
    pos = 0
    for i, n in enumerate(n_turns):
        ts[pos] = conv_starts[i]
        if n > 1:
            ts[pos + 1 : pos + n] = conv_starts[i] + np.cumsum(gaps_us[pos + 1 : pos + n])
        pos += n
    roles = _ROLES[turn_idx % 3]
    tools = _TOOLS[rng.integers(0, len(_TOOLS), size=total)]
    tools = np.where(roles == "tool", tools, "")
    text_len_words = np.maximum(1, rng.lognormal(2.0, 0.9, size=total).astype(np.int64))
    texts = [
        " ".join(_WORDS[rng.integers(0, len(_WORDS), size=k)]) for k in text_len_words
    ]
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles.tolist(), pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools.tolist(), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def generate_ctas_study(
    seed: int = 1,
    n_regions: int = 3,
    with_baseline: bool = False,
    na_share: float = 0.3,
) -> dict[str, pd.DataFrame]:
    """Regenerate the reference demo fixture's shape
    (data-raw/ctas_data.R:8-109): returns dict with subjects, parameters,
    data, custom_timeseries, custom_reference_groups."""
    rng = np.random.default_rng(seed)
    subj_rows = []
    sid = 0
    for r in range(n_regions):
        region = f"region_{r + 1}"
        for c in range(max(1, rng.poisson(3))):
            country = f"{region}_country_{c + 1}"
            for s in range(max(1, rng.poisson(4))):
                site = f"{country}_site_{s + 1}"
                for _ in range(max(1, rng.poisson(5))):
                    sid += 1
                    subj_rows.append(
                        {
                            "subject_id": f"subj_{sid:04d}",
                            "site": site,
                            "country": country,
                            "region": region,
                        }
                    )
    subjects = pd.DataFrame(subj_rows)

    parameters = pd.DataFrame(
        {
            "parameter_id": ["param_1", "param_2"],
            "parameter_name": ["Parameter 1", "Parameter 2"],
            "parameter_category_1": ["cat", "cat"],
            "parameter_category_2": [None, None],
            "parameter_category_3": [None, None],
            "time_point_count_min": [np.nan, np.nan],
            "subject_count_min": [np.nan, np.nan],
            "max_share_missing": [np.nan, np.nan],
            "generate_change_from_baseline": [None, None],
            "timeseries_features_to_calculate": [None, None],
            "use_only_custom_timeseries": [None, None],
        }
    )

    data_rows = []
    for _, subj in subjects.iterrows():
        for pid in parameters["parameter_id"]:
            n_tp = max(2, rng.poisson(20))
            level = rng.normal(30, 5)
            noise_sd = rng.uniform(1, 10)
            values = rng.normal(level, noise_sd, size=n_tp)
            na_mask = rng.random(n_tp) < na_share
            values = np.where(na_mask, np.nan, values)
            bl = rng.normal(level, noise_sd) if with_baseline else np.nan
            for t in range(n_tp):
                data_rows.append(
                    {
                        "subject_id": subj["subject_id"],
                        "parameter_id": pid,
                        "timepoint_1_name": f"VISIT {t + 1}",
                        "timepoint_2_name": "ND",
                        "timepoint_rank": float(t + 1),
                        "result": values[t],
                        "baseline": bl,
                    }
                )
    data = pd.DataFrame(data_rows)
    custom_timeseries = pd.DataFrame(
        columns=["timeseries_id", "parameter_id", "timepoint_combo"]
    )
    custom_reference_groups = pd.DataFrame(
        columns=["parameter_id", "feature", "ref_group"]
    )
    return {
        "subjects": subjects,
        "parameters": parameters,
        "data": data,
        "custom_timeseries": custom_timeseries,
        "custom_reference_groups": custom_reference_groups,
    }


def transcripts_to_study_tables(
    transcripts: pa.Table, n_sites: int = 12
) -> dict[str, pd.DataFrame]:
    """Derived mapping of the transcript table onto the reference data
    model (FIXTURES.md §A): conv_id -> subject_id, turn_idx ->
    timepoint_rank, derived numeric channels (text_len, turn_latency_s)
    -> result under derived parameter_ids, first-turn value -> baseline,
    and a hashed 3-level site/country/region hierarchy."""
    df = transcripts.to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    convs = pd.unique(df["conv_id"])
    # deterministic hash -> site hierarchy
    import zlib

    site_idx = np.array([zlib.crc32(c.encode()) % n_sites for c in convs])
    country_idx = site_idx % max(1, n_sites // 3)
    region_idx = country_idx % max(1, n_sites // 9)
    subjects = pd.DataFrame(
        {
            "subject_id": convs,
            "site": [f"site_{i}" for i in site_idx],
            "country": [f"country_{i}" for i in country_idx],
            "region": [f"region_{i}" for i in region_idx],
        }
    )
    text_len = df["text"].str.len().astype(float)
    ts_us = df["ts"].astype("int64")
    lat = ts_us.groupby(df["conv_id"]).diff() / 1e6
    frames = []
    for pid, series in (("text_len", text_len), ("turn_latency_s", lat)):
        sub = pd.DataFrame(
            {
                "subject_id": df["conv_id"].to_numpy(),
                "parameter_id": pid,
                "timepoint_1_name": "TURN " + (df["turn_idx"] + 1).astype(str),
                "timepoint_2_name": "ND",
                "timepoint_rank": (df["turn_idx"] + 1).astype(float).to_numpy(),
                "result": series.to_numpy(dtype=np.float64),
                "baseline": series.groupby(df["conv_id"].to_numpy()).transform("first").to_numpy(),
            }
        )
        frames.append(sub)
    data = pd.concat(frames, ignore_index=True)
    parameters = pd.DataFrame(
        {
            "parameter_id": ["text_len", "turn_latency_s"],
            "parameter_name": ["Turn text length", "Inter-turn latency (s)"],
            "parameter_category_1": ["transcript", "transcript"],
            "parameter_category_2": [None, None],
            "parameter_category_3": [None, None],
            "time_point_count_min": [np.nan, np.nan],
            "subject_count_min": [np.nan, np.nan],
            "max_share_missing": [np.nan, np.nan],
            "generate_change_from_baseline": [None, None],
            "timeseries_features_to_calculate": [None, None],
            "use_only_custom_timeseries": [None, None],
        }
    )
    return {"subjects": subjects, "parameters": parameters, "data": data}
