"""[graft] Deduplication operators over a documents table
(doc_id, text, ...): exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Scale design (ray_guide.md "Aggregation at scale"):
- exact: content-hash column in a vectorized map_batches, then
  groupby(hash) keep-first — a hash-partitioned shuffle of ONE narrow
  column plus ids, never the texts twice.
- MinHash-LSH: per-batch shingle->signature (actor pool: permutation
  tables built once per actor), explode to (band, band_hash, doc_id)
  rows, groupby band bucket -> candidate pairs, exact-Jaccard verify,
  connected components by iterative min-label propagation (driver
  union-find only on the provably-small candidate set).
- SimHash: 64-bit fingerprints, banded into 4x16-bit LSH keys,
  Hamming<=threshold verify.
- embedding cosine: normalize + random-hyperplane bucket, verify
  cosine within buckets.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.text import (
    WS_RE,
    char_shingles,
    hamming64,
    md5_fingerprint,
    minhash_band_hashes,
    minhash_perms,
    minhash_signature,
    simhash64,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "simhash_dedup",
    "embedding_cosine_dedup",
    "jaccard",
]


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Exact dedup: one surviving row per distinct text — the survivor is
    the minimum id (deterministic). Returns (doc_id, content_hash,
    n_copies). Hash-partitioned on the content hash; texts never
    shuffled."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "content_hash": [md5_fingerprint(t) for t in b[text_col]],
            }
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: [g[id_col].min()],
                "content_hash": [g["content_hash"].iloc[0]],
                "n_copies": [len(g)],
            }
        )

    return (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over sorted unique shingle arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


class MinHashStage:
    """Actor-pool stage: permutation tables + shingler built ONCE per
    actor (__init__), signatures per batch (__call__)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 1234,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.a, self.b = minhash_perms(n_perm, seed)
        self.k = shingle_k
        self.n_perm = n_perm
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in batch[self.text_col]:
            sh = char_shingles(text, self.k)
            sigs.append(minhash_signature(sh, self.a, self.b).tobytes())
        return pd.DataFrame({self.id_col: batch[self.id_col], "sig": sigs})


def minhash_lsh_dedup(
    docs: rd.Dataset,
    threshold: float = 0.8,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
) -> pd.DataFrame:
    """Near-dup clusters via MinHash-LSH. Returns a pandas frame
    (doc_id, cluster_id) for every document in a near-dup cluster of
    size >= 2, cluster_id = min doc_id of the component.

    Candidate verification uses the SIGNATURE Jaccard estimate
    (matching-minhash fraction) — exact-text verify would reshuffle the
    corpus; the estimate's error is ~1/sqrt(n_perm). The candidate/
    verify/cluster tail runs on the driver: it is bounded by the number
    of colliding pairs, not corpus size (documented assumption)."""
    sig_ds = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "n_perm": n_perm, "shingle_k": shingle_k,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_band, rows_hash, rows_sig = [], [], [], []
        for did, sig in zip(b[id_col], b["sig"]):
            arr = np.frombuffer(sig, dtype=np.uint64)
            for band_i, bh in enumerate(minhash_band_hashes(arr, n_bands)):
                rows_id.append(did)
                rows_band.append(band_i)
                rows_hash.append(bh)
                rows_sig.append(sig)
        return pd.DataFrame(
            {id_col: rows_id, "band": rows_band, "band_hash": rows_hash, "sig": rows_sig}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "est_jaccard"])
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float(np.mean(sigs[i] == sigs[j]))
                if est >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(est)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

    pairs = (
        sig_ds.map_batches(explode_bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return _connected_components(pairs, id_col)


def _connected_components(pairs: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Union-find over verified pairs (driver-side: candidate pairs are
    bounded by LSH collisions, not corpus size)."""
    if len(pairs) == 0:
        return pd.DataFrame(columns=[id_col, "cluster_id"])
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"])
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    rows = [(x, find(x)) for x in parent]
    return pd.DataFrame(rows, columns=[id_col, "cluster_id"]).sort_values(
        id_col, kind="mergesort"
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard (anchor-blocked exact verify)
# ---------------------------------------------------------------------------


def ngram_jaccard_dedup(
    docs: rd.Dataset,
    threshold: float = 0.8,
    shingle_k: int = 5,
    anchor_mod: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Near-dup clusters by EXACT n-gram Jaccard with anchor-shingle
    candidate blocking: each doc is indexed under its shingles with
    hash % anchor_mod == 0 ("anchors", ~1/anchor_mod of shingles); two
    docs with Jaccard >= t share anchors with overwhelming probability
    (a pair sharing m shingles misses all anchors with
    (1-1/anchor_mod)^m). Candidates sharing an anchor bucket get exact
    set-Jaccard verification; union-find closes clusters.

    Unlike MinHash-LSH this verifies the TRUE Jaccard (no signature
    estimate); the cost is shipping shingle sets of bucket-colliding
    docs into the verify groups (bounded by anchor collisions).
    """

    def index_anchors(b: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_anchor, rows_sh = [], [], []
        for did, text in zip(b[id_col], b[text_col]):
            sh = char_shingles(text, shingle_k)
            anchors = sh[sh % np.uint64(anchor_mod) == 0]
            blob = sh.tobytes()
            for a in anchors.tolist():
                rows_id.append(did)
                rows_anchor.append(a)
                rows_sh.append(blob)
        return pd.DataFrame(
            {id_col: rows_id, "anchor": rows_anchor, "shingles": rows_sh}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col, kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
        ids = g[id_col].to_numpy()
        sets = [np.frombuffer(s, dtype=np.uint64) for s in g["shingles"]]
        oa, ob, oj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(sets[i], sets[j])
                if jac >= threshold:
                    oa.append(ids[i])
                    ob.append(ids[j])
                    oj.append(jac)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "jaccard": oj})

    pairs = (
        docs.map_batches(index_anchors, batch_format="pandas")
        .groupby("anchor")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return _connected_components(pairs, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """Actor-pool stage: 64-bit SimHash per doc (tokenizer compiled once)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = [
            simhash64([t for t in WS_RE.split(text.strip()) if t])
            for text in batch[self.text_col]
        ]
        return pd.DataFrame(
            {self.id_col: batch[self.id_col], "simhash": np.array(fps, dtype=np.uint64)}
        )


def simhash_dedup(
    docs: rd.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
) -> pd.DataFrame:
    """Near-dup clusters by SimHash: 4x16-bit LSH bands (any pair with
    Hamming distance <= 16/... <= max_hamming shares at least one exact
    band by pigeonhole when max_hamming < 4), Hamming verify, union-find."""
    fp_ds = docs.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, bands, keys, fps = [], [], [], []
        for did, fp in zip(b[id_col], b["simhash"]):
            fp = int(fp)
            for band_i in range(4):
                ids.append(did)
                bands.append(band_i)
                keys.append((fp >> (band_i * 16)) & 0xFFFF)
                fps.append(fp)
        return pd.DataFrame({id_col: ids, "band": bands, "key": keys, "fp": fps})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        fps = g["fp"].to_numpy()
        oa, ob, oh = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(int(fps[i]), int(fps[j]))
                if h <= max_hamming:
                    oa.append(ids[i])
                    ob.append(ids[j])
                    oh.append(h)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "hamming": oh})

    pairs = (
        fp_ds.map_batches(explode, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return _connected_components(pairs, id_col)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_dedup(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Near-dup vectors: random-hyperplane LSH bucket (n_planes sign
    bits), exact cosine verify within buckets, union-find clusters.
    Multi-probe: each vector also lands in buckets at Hamming distance 1
    so near-threshold pairs straddling one plane still collide."""
    import ray

    first = embeddings.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.normal(0, 1, size=(dim, n_planes)))

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        planes = ray.get(planes_ref)
        vecs = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        bits = ((unit @ planes) > 0).astype(np.int64)
        key_int = bits @ (1 << np.arange(n_planes, dtype=np.int64))
        ids, buckets, rows = [], [], []
        for i in range(len(b)):
            base = int(key_int[i])
            probes = [base] + [base ^ (1 << p) for p in range(n_planes)]
            for bk in probes:
                ids.append(b[id_col].iloc[i])
                buckets.append(bk)
                rows.append(unit[i].tobytes())
        return pd.DataFrame({id_col: ids, "bucket": buckets, "unit": rows})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col, kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        ids = g[id_col].to_numpy()
        mat = np.stack([np.frombuffer(u, dtype=np.float64) for u in g["unit"]])
        cos = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "cosine": cos[ii, jj][keep]}
        )

    pairs = (
        embeddings.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return _connected_components(pairs, id_col)
