"""[graft] Text-analysis stages over a documents table: language-ID,
quality scoring, token counting, fingerprints — one plain-task
``map_batches`` pass (regexes/stopword tables are module-level state,
compiled once per worker process at import; no actor pool needed)."""

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

__all__ = ["text_stats_batch", "analyze_documents", "repetition_stats_batch",
           "repetition_stats"]


def text_stats_batch(
    batch: pd.DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    with_winnow: bool = False,
) -> pd.DataFrame:
    """One pass per batch computing every per-doc text statistic; the
    state (compiled regexes, stopword sets) is module-level, loaded once
    per worker process."""
    ids = batch[id_col].to_numpy()
    texts = batch[text_col].tolist()
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
        if with_winnow:
            row["winnow_fp"] = np.array(winnow_fingerprint(t), dtype=np.int64)
        rows.append(row)
    out = pd.DataFrame(rows)
    out.insert(0, id_col, ids)
    return out


def repetition_stats_batch(
    batch: pd.DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
) -> pd.DataFrame:
    """Gopher-style repetition signals per document: word counts,
    distinct-word and distinct-bigram counts and the most-frequent-word
    count — all integers, so the result is bit-exact against the SQL
    oracle (split semantics match ``string_split(text, ' ')``: empty
    text yields one empty token, consecutive spaces yield empty tokens).

    Downstream quality gates use e.g. ``top_word_count / n_words`` and
    ``1 - n_distinct_bigrams / n_bigrams`` as repetition ratios.
    """
    from collections import Counter

    ids = batch[id_col].to_numpy()
    texts = batch[text_col].tolist()
    n_words = np.empty(len(texts), dtype=np.int64)
    n_dw = np.empty(len(texts), dtype=np.int64)
    topw = np.empty(len(texts), dtype=np.int64)
    n_bg = np.empty(len(texts), dtype=np.int64)
    n_dbg = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = t.split(" ")
        wc = Counter(words)
        n_words[i] = len(words)
        n_dw[i] = len(wc)
        topw[i] = max(wc.values())
        bigrams = Counter(
            words[j] + " " + words[j + 1] for j in range(len(words) - 1)
        )
        n_bg[i] = len(words) - 1
        n_dbg[i] = len(bigrams)
    return pd.DataFrame(
        {
            id_col: ids,
            "n_words": n_words,
            "n_distinct_words": n_dw,
            "top_word_count": topw,
            "n_bigrams": n_bg,
            "n_distinct_bigrams": n_dbg,
        }
    )


def repetition_stats(
    docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    import functools

    return docs.map_batches(
        functools.partial(repetition_stats_batch, id_col=id_col, text_col=text_col),
        batch_format="pandas",
    )


def analyze_documents(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_winnow: bool = False,
    concurrency: int | tuple[int, int] = 4,  # unused: stage is plain tasks now
) -> rd.Dataset:
    import functools

    return docs.map_batches(
        functools.partial(
            text_stats_batch, id_col=id_col, text_col=text_col,
            with_winnow=with_winnow,
        ),
        batch_format="pandas",
    )
