"""[graft] Distributed k-means over an embedding column (Lloyd's
iterations), the curation-side clustering primitive (domain bucketing,
diversity sampling, IVF coarse quantizers all reduce to it).

Integer-exact formulation so the result is VALUE-EXACT against a SQL
oracle (same discipline as the other hash-verified operators):

- vectors are e6-quantized to int64 once (``floor(x * 1e6 + 0.5)``,
  the repo-wide quantization chain);
- distances are exact int64 squared-L2 sums (dim * (2e6)^2 << 2^63);
- the argmin tie-break is the smallest cluster index;
- centroid updates are FLOOR-divided integer means (``sum // count``),
  so every iteration stays in exact integer arithmetic — no float
  accumulation-order hazard anywhere;
- empty clusters keep their previous centroid.

Scale shape: centroids broadcast via ``ray.put`` (read once per batch,
never re-shipped); each assignment pass is one streaming ``map_batches``
emitting k x dim integer PARTIAL sums per block (the combiner pattern
— the driver merge is O(#blocks * k * dim), independent of corpus
size); no shuffle at all. Init = the k vectors with the smallest ids
(deterministic; per-block top-k then a tiny driver merge, never a
global sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

__all__ = ["kmeans_quantized", "pq_assignments"]


def _quantize(col: pd.Series) -> np.ndarray:
    mat = np.stack([np.asarray(e, dtype=np.float32) for e in col]).astype(
        np.float64
    )
    return np.floor(mat * 1e6 + 0.5).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact int64 squared-L2 argmin; ties -> smallest cluster index
    (np.argmin picks the first minimum)."""
    # (n, k, d) diff would be fine at batch size; keep peak memory at
    # n*k*d*8 bounded by the batch size the caller chose.
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(q)), a]


def _smallest_k_init(ds: rd.Dataset, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Centroid init = the k smallest-id vectors: per-block local top-k,
    tiny driver merge (no global sort, no full collect)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, id_col)[[id_col, vec_col]]

    head = ds.map_batches(local, batch_format="pandas").to_pandas()
    head = head.nsmallest(k, id_col).sort_values(id_col)
    return _quantize(head[vec_col])


def kmeans_quantized(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Lloyd's k-means with integer-exact arithmetic.

    Returns the final assignment frame (id_col, cluster, dist2) with
    dist2 the exact int64 squared L2 distance in e6-quantized space.
    """
    cents = _smallest_k_init(ds, k, id_col, vec_col)
    dim = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        "cluster": np.empty(0, np.int64),
                        "n": np.empty(0, np.int64),
                        **{
                            f"s{j}": np.empty(0, np.int64)
                            for j in range(dim)
                        },
                    }
                )
            q = _quantize(b[vec_col])
            a, _ = _assign(q, c)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            out = {"cluster": np.arange(k, dtype=np.int64), "n": cnt}
            for j in range(dim):
                out[f"s{j}"] = sums[:, j]
            return pd.DataFrame(out)

        merged = (
            ds.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby("cluster", sort=True)
            .sum()
        )
        n = merged["n"].to_numpy(np.int64)
        s = merged[[f"s{j}" for j in range(dim)]].to_numpy(np.int64)
        new = cents.copy()
        nz = n > 0
        # exact floor division (numpy // floors; the SQL oracle uses the
        # positive-mod divisible-numerator form, which is identical)
        new[nz] = s[nz] // n[nz, None]
        cents = new

    cref = ray.put(cents)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        if len(b) == 0:
            return pd.DataFrame(
                {
                    id_col: np.empty(0, np.int64),
                    "cluster": np.empty(0, np.int64),
                    "dist2": np.empty(0, np.int64),
                }
            )
        q = _quantize(b[vec_col])
        a, d2 = _assign(q, c)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "cluster": a.astype(np.int64),
                "dist2": d2.astype(np.int64),
            }
        )

    out = ds.map_batches(final, batch_format="pandas").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def _slice_vec(ds: rd.Dataset, lo: int, hi: int, vec_col: str) -> rd.Dataset:
    """Project the embedding column to coordinates [lo, hi) — a
    stateless per-batch slice, zero shuffle."""

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[vec_col] = [np.asarray(e, dtype=np.float32)[lo:hi] for e in b[vec_col]]
        return b

    return ds.map_batches(cut, batch_format="pandas")


def pq_assignments(
    ds: rd.Dataset,
    dim: int,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """[graft] Product-quantization codebook fit + assignment: split the
    embedding into two contiguous subspaces and run the integer-exact
    Lloyd's k-means (same discipline as :func:`kmeans_quantized` — e6
    quantization, exact int64 squared-L2, smallest-index tie-break,
    floor-divided centroid means) independently in each. The code pair
    (code0, code1) compresses a vector to 2 * log2(k) bits plus shared
    codebooks — the standard memory rung below int8 for 10^9-vector ANN.
    Every step is integer-exact, so the result is VALUE-EXACT against
    an unrolled SQL oracle. k*iters passes stream; no shuffle."""
    half = dim // 2
    a = kmeans_quantized(
        _slice_vec(ds, 0, half, vec_col), k=k, iters=iters,
        id_col=id_col, vec_col=vec_col,
    ).rename(columns={"cluster": "code0", "dist2": "dist2_0"})
    b = kmeans_quantized(
        _slice_vec(ds, half, dim, vec_col), k=k, iters=iters,
        id_col=id_col, vec_col=vec_col,
    ).rename(columns={"cluster": "code1", "dist2": "dist2_1"})
    out = a.merge(b, on=id_col, how="inner")
    return out.sort_values(id_col).reset_index(drop=True)
