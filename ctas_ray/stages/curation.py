"""[graft] Corpus curation: quality-gate + exact-dedup filter over a
documents table — the canonical "clean a training corpus" composition
(quality scoring -> threshold filter -> duplicate removal), value-exact
against a SQL oracle.

Scale design: one task map_batches computes the integer quality
ingredients (chars, digits, punct, uppercase, whitespace tokens, md5),
the filter happens in the same batch (no exchange), and only the
surviving (doc_id, fingerprint, counts) rows — never texts — enter the
single keep-first hash exchange. Thresholds are INTEGER
cross-multiplications (``n_punct * 10 <= n_chars * 3`` rather than
``punct_ratio <= 0.3``) so the engine and the SQL oracle agree exactly
with no float rounding.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.text import WS_RE, md5_fingerprint
from .dedup import _pipeline_parts, _row_part

__all__ = ["CurationConfig", "curate_documents"]

# byte-identical with the RE2 classes in the DuckDB oracle
_DIGIT_RE = re.compile(r"[0-9]")
_PUNCT_RE = re.compile(r"[^0-9A-Za-z_ \t\n\f\r]")


@dataclass(frozen=True)
class CurationConfig:
    """Integer-exact quality gates (numerator*10 <= n_chars*limit10)."""

    min_chars: int = 50
    max_chars: int = 10_000
    max_punct_per10: int = 3  # n_punct * 10 <= n_chars * 3  (<= 30%)
    max_digit_per10: int = 3
    min_ws_tokens: int = 5
    dedup_exact: bool = True


def curate_documents(
    docs: rd.Dataset,
    cfg: CurationConfig = CurationConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Returns the surviving corpus rows (id, n_chars, ws_tokens,
    content fingerprint) after quality gates and exact keep-first
    dedup (min id survives)."""
    nparts = _pipeline_parts(docs)

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].tolist()
        n_chars = b[text_col].str.len().to_numpy(dtype=np.int64)
        n_digits = np.fromiter(
            (len(_DIGIT_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_punct = np.fromiter(
            (len(_PUNCT_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        ws_tokens = np.fromiter(
            (sum(1 for x in WS_RE.split(t.strip()) if x) for t in texts),
            dtype=np.int64, count=len(texts),
        )
        keep = (
            (n_chars >= cfg.min_chars)
            & (n_chars <= cfg.max_chars)
            & (n_punct * 10 <= n_chars * cfg.max_punct_per10)
            & (n_digits * 10 <= n_chars * cfg.max_digit_per10)
            & (ws_tokens >= cfg.min_ws_tokens)
        )
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[keep],
                "n_chars": n_chars[keep],
                "ws_tokens": ws_tokens[keep],
                "fingerprint": [md5_fingerprint(t) for t, k in zip(texts, keep) if k],
            }
        )
        if cfg.dedup_exact:
            out["part"] = _row_part(out, ["fingerprint"], nparts)
        return out

    gated = docs.map_batches(gate, batch_format="pandas")
    if not cfg.dedup_exact:
        return gated

    def keep_first_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fingerprint", id_col], kind="mergesort")
        first = ~g["fingerprint"].duplicated()
        return g.loc[first, [id_col, "n_chars", "ws_tokens", "fingerprint"]]

    return gated.groupby("part").map_groups(keep_first_part, batch_format="pandas")
