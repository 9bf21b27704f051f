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

Multi-subspace fusion (round 3): product quantization runs Lloyd's
independently per subspace, but the DATA passes are shared — one
``map_batches`` per iteration quantizes each vector once and emits
every subspace's partial sums together, so a 2-subspace PQ fit costs
(1 init + iters + 1 assign) dataset scans instead of 2x that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

__all__ = ["kmeans_quantized", "pq_assignments", "pq_adc_topk"]


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


def _kmeans_spans(
    ds: rd.Dataset,
    spans: list[tuple[int, int]],
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    return_centroids: bool = False,
):
    """Fused Lloyd's over one or more contiguous coordinate spans of the
    embedding. Each dataset pass quantizes a batch ONCE and serves every
    span; per-span arithmetic is exactly :mod:`kmeans_quantized`'s
    integer chain, so results are independent of how many spans share
    the pass (pinned by the hash-verified pq/kmeans contract rows).

    Returns one frame: (id_col, code_0, dist2_0[, code_1, dist2_1, ...])
    sorted by id."""
    spans = [tuple(s) for s in spans]
    n_spans = len(spans)
    widths = [hi - lo for lo, hi in spans]
    maxw = max(widths)

    # ---- init: the k smallest-id vectors, read once for all spans
    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, id_col)[[id_col, vec_col]]

    head = ds.map_batches(local, batch_format="pandas").to_pandas()
    head = head.nsmallest(k, id_col).sort_values(id_col)
    qh = _quantize(head[vec_col])
    cents = [qh[:, lo:hi].copy() for lo, hi in spans]

    sum_cols = [f"s{j}" for j in range(maxw)]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            cs = ray.get(cref)
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        "span": np.empty(0, np.int64),
                        "cluster": np.empty(0, np.int64),
                        "n": np.empty(0, np.int64),
                        **{c: np.empty(0, np.int64) for c in sum_cols},
                    }
                )
            q = _quantize(b[vec_col])
            frames = []
            for si, (lo, hi) in enumerate(spans):
                qs = q[:, lo:hi]
                a, _ = _assign(qs, cs[si])
                sums = np.zeros((k, maxw), dtype=np.int64)
                np.add.at(sums[:, : hi - lo], a, qs)
                cnt = np.bincount(a, minlength=k).astype(np.int64)
                out = {
                    "span": np.full(k, si, dtype=np.int64),
                    "cluster": np.arange(k, dtype=np.int64),
                    "n": cnt,
                }
                for j, c in enumerate(sum_cols):
                    out[c] = sums[:, j]
                frames.append(pd.DataFrame(out))
            return pd.concat(frames, ignore_index=True)

        merged = (
            ds.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby(["span", "cluster"], sort=True)
            .sum()
        )
        for si in range(n_spans):
            g = merged.loc[si]
            n = g["n"].to_numpy(np.int64)
            s = g[sum_cols[: widths[si]]].to_numpy(np.int64)
            new = cents[si].copy()
            nz = n > 0
            # exact floor division (numpy // floors; the SQL oracle uses
            # the positive-mod divisible-numerator form — identical)
            new[nz] = s[nz] // n[nz, None]
            cents[si] = new

    cref = ray.put(cents)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cref)
        cols = {id_col: np.empty(0, np.int64)}
        for si in range(n_spans):
            cols[f"code_{si}"] = np.empty(0, np.int64)
            cols[f"dist2_{si}"] = np.empty(0, np.int64)
        if len(b) == 0:
            return pd.DataFrame(cols)
        q = _quantize(b[vec_col])
        out = {id_col: b[id_col].to_numpy(np.int64)}
        for si, (lo, hi) in enumerate(spans):
            a, d2 = _assign(q[:, lo:hi], cs[si])
            out[f"code_{si}"] = a.astype(np.int64)
            out[f"dist2_{si}"] = d2.astype(np.int64)
        return pd.DataFrame(out)

    out = ds.map_batches(final, batch_format="pandas").to_pandas()
    out = out.sort_values(id_col).reset_index(drop=True)
    if return_centroids:
        return out, cents
    return out


def kmeans_quantized(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> pd.DataFrame:
    """Lloyd's k-means with integer-exact arithmetic.

    Returns the final assignment frame (id_col, cluster, dist2) with
    dist2 the exact int64 squared L2 distance in e6-quantized space.
    """
    if dim is None:
        probe = ds.limit(1).to_pandas()
        dim = len(np.asarray(probe[vec_col].iloc[0]))
    out = _kmeans_spans(ds, [(0, dim)], k, iters, id_col, vec_col)
    return out.rename(columns={"code_0": "cluster", "dist2_0": "dist2"})


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
    an unrolled SQL oracle. Both subspaces share every dataset pass
    (fused: 1 init + iters + 1 assign scans total); no shuffle."""
    half = dim // 2
    out = _kmeans_spans(
        ds, [(0, half), (half, dim)], k, iters, id_col, vec_col
    )
    out = out.rename(
        columns={
            "code_0": "code0",
            "dist2_0": "dist2_0",
            "code_1": "code1",
            "dist2_1": "dist2_1",
        }
    )
    return out.sort_values(id_col).reset_index(drop=True)


def pq_adc_topk(
    ds: rd.Dataset,
    dim: int,
    k: int = 4,
    iters: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list | None = None,
) -> pd.DataFrame:
    """[graft] PQ asymmetric-distance (ADC) top-k search — the search
    rung that goes with :func:`pq_assignments`' memory rung: fit the
    integer-exact PQ codebooks, build the query's per-subspace distance
    LUT once on the driver (k entries per span), then one distributed
    pass computes each vector's code pair and its ADC distance
    lut0[code0] + lut1[code1] as pure int64 table lookups — the classic
    IVF-ADC inner loop (Jegou et al. 2011) over 2*log2(k)-bit codes
    instead of full vectors. Per-batch top-k (dist asc, id asc) then a
    tiny driver merge; only k rows ship per batch.

    The query vector is the corpus row with the smallest id — fully
    deterministic, so the whole search (codebooks, codes, LUT, ranking)
    is VALUE-EXACT against an unrolled SQL oracle."""
    half = dim // 2
    spans = [(0, half), (half, dim)]
    if cents is None:
        _, cents = _kmeans_spans(
            ds, spans, k, iters, id_col, vec_col, return_centroids=True
        )

    def qhead(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(1, id_col)[[id_col, vec_col]]

    qrow = ds.map_batches(qhead, batch_format="pandas").to_pandas()
    qrow = qrow.nsmallest(1, id_col)
    qvec = _quantize(qrow[vec_col])[0]
    # per-span LUT: exact int64 squared-L2 from the query's span slice
    # to each centroid — k entries per span, broadcast with the cents
    luts = [
        ((qvec[lo:hi][None, :] - cents[si]) ** 2).sum(axis=1)
        for si, (lo, hi) in enumerate(spans)
    ]
    state = ray.put((cents, luts))

    def adc_batch(b: pd.DataFrame) -> pd.DataFrame:
        cs, ls = ray.get(state)
        cols = {
            id_col: np.empty(0, np.int64),
            "adc_dist2": np.empty(0, np.int64),
        }
        if len(b) == 0:
            return pd.DataFrame(cols)
        q = _quantize(b[vec_col])
        dist = np.zeros(len(b), dtype=np.int64)
        for si, (lo, hi) in enumerate(spans):
            a, _ = _assign(q[:, lo:hi], cs[si])
            dist += ls[si][a]
        ids = b[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, dist))[:topk]
        return pd.DataFrame(
            {id_col: ids[order], "adc_dist2": dist[order]}
        )

    merged = ds.map_batches(adc_batch, batch_format="pandas").to_pandas()
    merged = merged.sort_values(
        ["adc_dist2", id_col], kind="mergesort"
    ).head(topk)
    return merged.reset_index(drop=True)
