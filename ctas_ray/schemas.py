"""Arrow schema constants + fail-fast validation.

Mirrors the reference's entry gate ``check_input_data``
(R/ctas.R:1048-1187): fixed, explicitly validated schemas, hard stop on
mismatch — but expressed as ``pyarrow.Schema`` constants checked before
the Dataset DAG is built.
"""

from __future__ import annotations

import pyarrow as pa

# [graft] canonical transcript table (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ctas data model (R/ctas.R:1054-1086), Arrow-typed per SURVEY.md §1.5
SUBJECTS_SCHEMA = pa.schema(
    [
        pa.field("subject_id", pa.string()),
        pa.field("site", pa.string()),
        pa.field("country", pa.string()),
        pa.field("region", pa.string()),
    ]
)

DATA_SCHEMA = pa.schema(
    [
        pa.field("subject_id", pa.string()),
        pa.field("parameter_id", pa.string()),
        pa.field("timepoint_1_name", pa.string()),
        pa.field("timepoint_2_name", pa.string()),
        pa.field("timepoint_rank", pa.float64()),
        pa.field("result", pa.float64()),
        pa.field("baseline", pa.float64()),
    ]
)

PARAMETERS_COLUMNS = [
    "parameter_id",
    "parameter_name",
    "parameter_category_1",
    "parameter_category_2",
    "parameter_category_3",
    "time_point_count_min",
    "subject_count_min",
    "max_share_missing",
    "generate_change_from_baseline",
    "timeseries_features_to_calculate",
    "use_only_custom_timeseries",
]

CUSTOM_TIMESERIES_COLUMNS = ["timeseries_id", "parameter_id", "timepoint_combo"]
CUSTOM_REFERENCE_GROUPS_COLUMNS = ["parameter_id", "feature", "ref_group"]

VALID_FEATURES = {
    "autocorr",
    "average",
    "own_site_simil_score",
    "sd",
    "unique_value_count_relative",
    "range",
    "lof",
}  # R/ctas.R:1151,1161-1163

VALID_SITE_SCORING = {"ks", "mixedeffects", "avg_feat_value"}  # R/ctas.R:33


class SchemaError(ValueError):
    """Raised on schema/contract violations (mirrors R ``stop()`` calls)."""


def validate_transcripts_schema(schema: pa.Schema) -> None:
    """Check the canonical transcript table shape (input_hint)."""
    for field in TRANSCRIPT_SCHEMA:
        if schema.field(field.name) is None:  # pragma: no cover
            raise SchemaError(f"transcripts: missing column {field.name}")
        actual = schema.field(field.name).type
        if actual != field.type and not (
            pa.types.is_large_string(actual) and pa.types.is_string(field.type)
        ):
            raise SchemaError(
                f"transcripts: column {field.name} has type {actual}, want {field.type}"
            )


def require_columns(table_name: str, have: list[str], want: list[str]) -> None:
    missing = [c for c in want if c not in have]
    if missing:
        raise SchemaError(f"{table_name}: missing required columns {missing}")
