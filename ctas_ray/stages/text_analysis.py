"""[graft] Text-analysis stages over a documents table: language-ID,
quality scoring, token counting, fingerprints — all actor-pool
``map_batches`` stages (regexes/tables compiled once per actor)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.text import (
    lang_id,
    md5_fingerprint,
    quality_stats,
    token_count,
    winnow_fingerprint,
)

__all__ = ["TextStats", "analyze_documents"]


class TextStats:
    """One pass per batch computing every per-doc text statistic; state
    (compiled regexes, stopword sets) is module-level and loaded once
    per actor process."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 with_winnow: bool = False) -> None:
        self.id_col = id_col
        self.text_col = text_col
        self.with_winnow = with_winnow

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        texts = batch[self.text_col].tolist()
        rows = []
        for t in texts:
            q = quality_stats(t)
            ws, bpe = token_count(t)
            lang, lang_score = lang_id(t)
            row = {
                "n_chars": int(q["n_chars"]),
                "ws_tokens": ws,
                "bpe_tokens": bpe,
                "punct_ratio": q["punct_ratio"],
                "digit_ratio": q["digit_ratio"],
                "stopword_ratio": q["stopword_ratio"],
                "upper_ratio": q["upper_ratio"],
                "mean_token_len": q["mean_token_len"],
                "lang": lang,
                "lang_score": lang_score,
                "fingerprint": md5_fingerprint(t),
            }
            if self.with_winnow:
                row["winnow_fp"] = np.array(winnow_fingerprint(t), dtype=np.int64)
            rows.append(row)
        out = pd.DataFrame(rows)
        out.insert(0, self.id_col, ids)
        return out


def analyze_documents(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_winnow: bool = False,
    concurrency: int | tuple[int, int] = 4,
) -> rd.Dataset:
    return docs.map_batches(
        TextStats,
        fn_constructor_kwargs={
            "id_col": id_col, "text_col": text_col, "with_winnow": with_winnow
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
