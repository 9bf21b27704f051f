"""[graft] Deduplication operators over a documents table
(doc_id, text, ...): exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Scale design (ray_guide.md "Aggregation at scale"), hardened against
the skew dedup actually meets (masses of identical documents):

- exact: content-hash column in a vectorized map_batches, then
  groupby(hash) keep-first — a hash-partitioned shuffle of ONE narrow
  column plus ids, never the texts twice.
- MinHash-LSH: per-batch shingle->signature (actor pool: permutation
  tables built once per actor); an EXACT-DUP COLLAPSE on the content
  hash so identical-text mass becomes one representative before LSH
  (the common skew case never reaches the buckets); band rows carry
  only (band, band_hash, doc_id) — signatures are re-joined onto the
  deduplicated candidate pairs, not replicated into all 16 band rows;
  per-bucket pair generation is CAPPED (clique below the cap, sorted
  chain above it, logged) so a pathological bucket is O(n), not O(n^2);
  connected components run driver-side below a pair-count limit and as
  distributed min-label propagation above it.
- SimHash: 64-bit fingerprints, banded into 4x16-bit LSH keys, exact
  collapse + capped buckets + Hamming<=threshold verify.
- embedding cosine: normalize + random-hyperplane multi-probe bucket,
  capped buckets, exact cosine verify within buckets.
"""

from __future__ import annotations

import logging

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

logger = logging.getLogger("ctas_ray.dedup")

# pairs below this count close on the driver (union-find over a few
# hundred MB worst case); above it, distributed min-label propagation
CC_DRIVER_PAIR_LIMIT = 2_000_000
# bucket sizes above this emit a sorted CHAIN (size-1 pairs) instead of
# the full clique (size^2/2 pairs). Connectivity of a genuinely-similar
# bucket survives chaining; a hash-skew bucket stops being quadratic.
MAX_BUCKET_SIZE = 256


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
# shared candidate/verify/cluster machinery
# ---------------------------------------------------------------------------


def _bucket_pairs_frame(ids: np.ndarray, max_bucket: int, bucket_desc: str) -> pd.DataFrame:
    """Candidate pairs for one bucket's sorted unique ids: full clique
    below ``max_bucket``, sorted chain above it (logged)."""
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    if n > max_bucket:
        logger.warning(
            "dedup bucket %s has %d members (> cap %d): emitting chain "
            "pairs instead of the full clique", bucket_desc, n, max_bucket
        )
        return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    ii, jj = np.triu_indices(n, k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


def _distinct_pairs(pairs: rd.Dataset) -> rd.Dataset:
    """Global pair dedup (a pair colliding in many buckets verifies once)."""

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return pairs.groupby(["id_a", "id_b"]).map_groups(head1, batch_format="pandas")


def _join_attr(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    side: str,
    id_col: str,
    attr_cols: list[str],
    num_partitions: int,
) -> rd.Dataset:
    """Hash-join one side's attributes onto the candidate pairs: ships
    each attribute value only to the pairs that need it (instead of
    replicating it into every band/bucket row). The joined attribute
    columns are renamed to ``<attr>_<side>``."""
    joined = pairs.join(
        attrs,
        join_type="inner",
        num_partitions=num_partitions,
        on=(side,),
        right_on=(id_col,),
        right_suffix="_r",
    )

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        ren = {}
        for c in attr_cols:
            src = c if c in b.columns else f"{c}_r"
            ren[src] = f"{c}_{side}"
        return b.rename(columns=ren)

    # materialize: two JoinOperators in ONE streaming plan can deadlock
    # each other's aggregator pools on small CPU counts; the joined pair
    # set is bounded by LSH collisions, so pinning it is cheap
    return joined.map_batches(clean, batch_format="pandas").materialize()


def _connected_components(pairs: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Union-find over verified pairs (driver-side path; used when the
    pair count is below CC_DRIVER_PAIR_LIMIT)."""
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


def _connected_components_distributed(
    pairs: rd.Dataset,
    id_col: str,
    num_partitions: int = 32,
    max_iters: int = 64,
) -> pd.DataFrame:
    """Distributed connected components by min-label propagation: each
    node repeatedly adopts the minimum label among itself and its
    neighbors (groupby-min per round; O(diameter) rounds). Every round
    shuffles only (node, label) rows — never signatures or texts."""

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([b["id_a"], b["id_b"]], ignore_index=True),
                "dst": pd.concat([b["id_b"], b["id_a"]], ignore_index=True),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        node = g["src"].iloc[0]
        return pd.DataFrame({"node": [node], "label": [min(node, g["dst"].min())]})

    labels = (
        edges.groupby("src").map_groups(init_labels, batch_format="pandas").materialize()
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("node",),
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["src"], "label": b["label"]}),
            batch_format="pandas",
        ).materialize()  # keep Join and the groupby Sort in separate plans
        merged = labels.union(nbr)

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": [g["node"].iloc[0]], "label": [g["label"].min()]}
            )

        new_labels = (
            merged.groupby("node").map_groups(take_min, batch_format="pandas").materialize()
        )
        changed = (
            new_labels.join(
                labels, join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("node",), right_suffix="_old",
            )
            .map_batches(
                lambda b: pd.DataFrame(
                    {"c": (b["label"] != b["label_old"]).astype(np.int64)}
                ),
                batch_format="pandas",
            )
            .sum("c")
        )
        labels = new_labels
        if not changed:
            break
    out = labels.to_pandas().rename(columns={"node": id_col, "label": "cluster_id"})
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)


def _close_clusters(pairs: rd.Dataset, id_col: str) -> pd.DataFrame:
    """Route to driver union-find or distributed label propagation based
    on the verified pair count."""
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pd.DataFrame(columns=[id_col, "cluster_id"])
    if n_pairs <= CC_DRIVER_PAIR_LIMIT:
        return _connected_components(pairs.to_pandas(), id_col)
    logger.info("dedup: %d verified pairs -> distributed label propagation", n_pairs)
    return _connected_components_distributed(pairs, id_col)


def _dup_members(members_ds: rd.Dataset, id_col: str) -> pd.DataFrame:
    """Collect only the exact-dup groups of size >= 2 to the driver:
    singleton members are their own representative and are already
    covered by the cluster table, so the collected frame is bounded by
    the duplicate mass (which is output anyway), not the corpus."""

    def groups_only(g: pd.DataFrame) -> pd.DataFrame:
        return g if len(g) >= 2 else g.iloc[:0]

    return (
        members_ds.groupby("rep").map_groups(groups_only, batch_format="pandas")
        .to_pandas()
    )


def _expand_exact_members(
    clusters: pd.DataFrame, members: pd.DataFrame, id_col: str
) -> pd.DataFrame:
    """Fold exact-duplicate members back into the near-dup clusters of
    their representatives; exact groups (>= 2 docs) whose representative
    joined no near-dup cluster become clusters of their own (the rep is
    the group's min id, so cluster_id stays the component min)."""
    if len(members) == 0:
        return clusters
    rep_cluster = dict(zip(clusters[id_col], clusters["cluster_id"]))
    grp_sizes = members.groupby("rep")[id_col].transform("size")
    out_ids: list = list(clusters[id_col])
    out_cids: list = list(clusters["cluster_id"])
    for did, rep, size in zip(members[id_col], members["rep"], grp_sizes):
        if rep in rep_cluster:
            if did != rep:  # rep row already present from `clusters`
                out_ids.append(did)
                out_cids.append(rep_cluster[rep])
        elif size >= 2:
            out_ids.append(did)
            out_cids.append(rep)
    return (
        pd.DataFrame({id_col: out_ids, "cluster_id": out_cids})
        .drop_duplicates(subset=[id_col])
        .sort_values(id_col, kind="mergesort")
        .reset_index(drop=True)
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
    actor (__init__); content hash + signature per batch (__call__)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 1234,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.a, self.b = minhash_perms(n_perm, seed)
        self.k = shingle_k
        self.n_perm = n_perm
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs, hashes = [], []
        for text in batch[self.text_col]:
            sh = char_shingles(text, self.k)
            sigs.append(minhash_signature(sh, self.a, self.b).tobytes())
            hashes.append(md5_fingerprint(text))
        return pd.DataFrame(
            {self.id_col: batch[self.id_col], "content_hash": hashes, "sig": sigs}
        )


def _exact_collapse(
    keyed: rd.Dataset, id_col: str, attr_cols: list[str]
) -> tuple[rd.Dataset, rd.Dataset]:
    """Collapse identical content before LSH: group by content_hash,
    keep the min-id representative (with its attribute columns) and a
    (doc_id, rep) membership table. Only ids + fixed-width attributes
    move through this exchange — never texts."""

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        rep = g[id_col].iloc[0]
        out = pd.DataFrame({id_col: g[id_col], "rep": rep, "is_rep": False})
        for c in attr_cols:
            out[c] = None
        out.iloc[0, out.columns.get_loc("is_rep")] = True
        for c in attr_cols:
            out.iloc[0, out.columns.get_loc(c)] = g[c].iloc[0]
        return out

    collapsed = (
        keyed.groupby("content_hash").map_groups(collapse, batch_format="pandas")
        .materialize()
    )
    reps = collapsed.map_batches(
        lambda b: b.loc[b["is_rep"], [id_col] + attr_cols], batch_format="pandas"
    )
    members = collapsed.map_batches(
        lambda b: b[[id_col, "rep"]], batch_format="pandas"
    )
    return reps, members


def minhash_lsh_dedup(
    docs: rd.Dataset,
    threshold: float = 0.8,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    num_join_partitions: int = 16,
) -> pd.DataFrame:
    """Near-dup clusters via MinHash-LSH. Returns a pandas frame
    (doc_id, cluster_id) for every document in a near-dup cluster of
    size >= 2, cluster_id = min doc_id of the component.

    Pipeline (each arrow is a narrow exchange; texts never shuffle):
    signature+hash per doc (actor pool) -> exact collapse on content
    hash (skew killer: 10^5 identical docs become ONE representative)
    -> band rows (band, band_hash, doc_id) — NO signature replication
    -> capped bucket pair generation -> global pair dedup -> signature
    re-join onto pairs -> estimate verify (matching-minhash fraction,
    error ~1/sqrt(n_perm)) -> connected components (driver union-find
    below CC_DRIVER_PAIR_LIMIT, distributed label propagation above)
    -> exact members folded back into their representative's cluster.
    """
    sig_full = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "n_perm": n_perm, "shingle_k": shingle_k,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
    reps, members_ds = _exact_collapse(sig_full, id_col, ["sig"])
    reps = reps.materialize()  # consumed by band explode AND the verify join

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_band, rows_hash = [], [], []
        for did, sig in zip(b[id_col], b["sig"]):
            arr = np.frombuffer(sig, dtype=np.uint64)
            for band_i, bh in enumerate(minhash_band_hashes(arr, n_bands)):
                rows_id.append(did)
                rows_band.append(band_i)
                rows_hash.append(bh)
        return pd.DataFrame({id_col: rows_id, "band": rows_band, "band_hash": rows_hash})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        return _bucket_pairs_frame(
            ids, max_bucket_size,
            f"(band={g['band'].iloc[0]}, hash={g['band_hash'].iloc[0]})",
        )

    candidates = _distinct_pairs(
        reps.map_batches(explode_bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).materialize()
    with_a = _join_attr(candidates, reps, "id_a", id_col, ["sig"], num_join_partitions)
    with_ab = _join_attr(with_a, reps, "id_b", id_col, ["sig"], num_join_partitions)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        est = np.array(
            [
                float(np.mean(
                    np.frombuffer(sa, dtype=np.uint64)
                    == np.frombuffer(sb, dtype=np.uint64)
                ))
                for sa, sb in zip(b["sig_id_a"], b["sig_id_b"])
            ]
        )
        keep = est >= threshold
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "est_jaccard": est[keep],
            }
        )

    verified = with_ab.map_batches(verify, batch_format="pandas")
    clusters = _close_clusters(verified, id_col)
    members = _dup_members(members_ds, id_col)
    return _expand_exact_members(clusters, members, id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard (anchor-blocked exact verify)
# ---------------------------------------------------------------------------


class ShingleStage:
    """Actor-pool stage: sorted-unique shingle set + content hash per doc."""

    def __init__(self, shingle_k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        blobs, hashes = [], []
        for text in batch[self.text_col]:
            blobs.append(char_shingles(text, self.k).tobytes())
            hashes.append(md5_fingerprint(text))
        return pd.DataFrame(
            {self.id_col: batch[self.id_col], "content_hash": hashes,
             "shingles": blobs}
        )


def ngram_jaccard_dedup(
    docs: rd.Dataset,
    threshold: float = 0.8,
    shingle_k: int = 5,
    anchor_mod: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    num_join_partitions: int = 16,
) -> pd.DataFrame:
    """Near-dup clusters by EXACT n-gram Jaccard with anchor-shingle
    candidate blocking: each doc is indexed under its shingles with
    hash % anchor_mod == 0 ("anchors", ~1/anchor_mod of shingles); two
    docs with Jaccard >= t share anchors with overwhelming probability
    (a pair sharing m shingles misses all anchors with
    (1-1/anchor_mod)^m).

    Unlike MinHash-LSH this verifies the TRUE Jaccard (no signature
    estimate). Anchor rows carry only (anchor, doc_id); the shingle
    sets are re-joined onto the deduplicated candidate pairs, so a
    doc's shingles ship once per colliding PAIR, not once per anchor.
    Exact collapse + bucket caps as in minhash_lsh_dedup.
    """
    shingled = docs.map_batches(
        ShingleStage,
        fn_constructor_kwargs={
            "shingle_k": shingle_k, "id_col": id_col, "text_col": text_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
    reps, members_ds = _exact_collapse(shingled, id_col, ["shingles"])
    reps = reps.materialize()

    def index_anchors(b: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_anchor = [], []
        for did, blob in zip(b[id_col], b["shingles"]):
            sh = np.frombuffer(blob, dtype=np.uint64)
            anchors = sh[sh % np.uint64(anchor_mod) == 0]
            for a in anchors.tolist():
                rows_id.append(did)
                rows_anchor.append(a)
        return pd.DataFrame({id_col: rows_id, "anchor": rows_anchor})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        return _bucket_pairs_frame(
            ids, max_bucket_size, f"(anchor={g['anchor'].iloc[0]})"
        )

    candidates = _distinct_pairs(
        reps.map_batches(index_anchors, batch_format="pandas")
        .groupby("anchor")
        .map_groups(bucket_pairs, batch_format="pandas")
    ).materialize()
    with_a = _join_attr(candidates, reps, "id_a", id_col, ["shingles"], num_join_partitions)
    with_ab = _join_attr(with_a, reps, "id_b", id_col, ["shingles"], num_join_partitions)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        oa, ob, oj = [], [], []
        for a_id, b_id, sa, sb in zip(
            b["id_a"], b["id_b"], b["shingles_id_a"], b["shingles_id_b"]
        ):
            jac = jaccard(
                np.frombuffer(sa, dtype=np.uint64), np.frombuffer(sb, dtype=np.uint64)
            )
            if jac >= threshold:
                oa.append(a_id)
                ob.append(b_id)
                oj.append(jac)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "jaccard": oj})

    verified = with_ab.map_batches(verify, batch_format="pandas")
    clusters = _close_clusters(verified, id_col)
    members = _dup_members(members_ds, id_col)
    return _expand_exact_members(clusters, members, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """Actor-pool stage: 64-bit SimHash + content hash per doc
    (tokenizer compiled once)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps, hashes = [], []
        for text in batch[self.text_col]:
            fps.append(simhash64([t for t in WS_RE.split(text.strip()) if t]))
            hashes.append(md5_fingerprint(text))
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "content_hash": hashes,
                "simhash": np.array(fps, dtype=np.uint64),
            }
        )


def simhash_dedup(
    docs: rd.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> pd.DataFrame:
    """Near-dup clusters by SimHash: 4x16-bit LSH bands (any pair with
    Hamming distance <= max_hamming < 4 shares at least one exact band
    by pigeonhole), capped buckets, Hamming verify, components.

    The fingerprint is 8 bytes, so (unlike MinHash signatures) carrying
    it in the band rows costs less than a re-join; buckets are still
    capped and identical texts collapse before banding."""
    fp_ds = docs.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    )
    reps, members_ds = _exact_collapse(fp_ds, id_col, ["simhash"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, bands, keys, fps = [], [], [], []
        for did, fp in zip(b[id_col], b["simhash"]):
            # mask: the fingerprint may arrive int64-wrapped (negative)
            # after crossing a pandas/Arrow exchange as an object column
            fp = int(fp) & 0xFFFFFFFFFFFFFFFF
            for band_i in range(4):
                ids.append(did)
                bands.append(band_i)
                keys.append((fp >> (band_i * 16)) & 0xFFFF)
                fps.append(fp)
        return pd.DataFrame(
            {id_col: ids, "band": bands, "key": keys,
             "fp": np.array(fps, dtype=np.uint64)}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        fps = g["fp"].to_numpy()
        pairs = _bucket_pairs_frame(
            ids, max_bucket_size, f"(band={g['band'].iloc[0]}, key={g['key'].iloc[0]})"
        )
        if len(pairs) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
        fp_of = dict(zip(ids, fps))
        h = np.array(
            [hamming64(int(fp_of[a]), int(fp_of[b]))
             for a, b in zip(pairs["id_a"], pairs["id_b"])]
        )
        keep = h <= max_hamming
        return pd.DataFrame(
            {
                "id_a": pairs["id_a"].to_numpy()[keep],
                "id_b": pairs["id_b"].to_numpy()[keep],
                "hamming": h[keep],
            }
        )

    verified = (
        reps.map_batches(explode, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(verify, batch_format="pandas")
    )
    clusters = _close_clusters(verified, id_col)
    members = _dup_members(members_ds, id_col)
    return _expand_exact_members(clusters, members, id_col)


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
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> pd.DataFrame:
    """Near-dup vectors: random-hyperplane LSH bucket (n_planes sign
    bits), exact cosine verify within buckets, union-find clusters.
    Multi-probe: each vector also lands in buckets at Hamming distance 1
    so near-threshold pairs straddling one plane still collide.
    Oversized buckets fall back to chain pairs (logged)."""
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
        if len(ids) > max_bucket_size:
            logger.warning(
                "embedding bucket %s has %d members (> cap %d): chain fallback",
                g["bucket"].iloc[0], len(ids), max_bucket_size,
            )
            cos = np.einsum("ij,ij->i", mat[:-1], mat[1:])
            keep = cos >= threshold
            return pd.DataFrame(
                {"id_a": ids[:-1][keep], "id_b": ids[1:][keep], "cosine": cos[keep]}
            )
        cos = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "cosine": cos[ii, jj][keep]}
        )

    verified = (
        embeddings.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    return _close_clusters(verified, id_col)
