"""Text-analysis kernels for large-scale training-data pipelines
[graft — no reference equivalent; first-class per the build brief]:
language-ID (stopword/n-gram heuristic), quality scoring, token
counting, document fingerprinting, shingling, MinHash, SimHash.

All vectorized or per-doc-linear; used inside ``map_batches`` stages
(compiled regexes and permutation tables live in actor ``__init__``).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

__all__ = [
    "WS_RE",
    "token_count",
    "quality_stats",
    "lang_id",
    "md5_fingerprint",
    "winnow_fingerprint",
    "char_shingles",
    "minhash_signature",
    "minhash_band_hashes",
    "simhash64",
    "hamming64",
]

WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[\w']+|[^\w\s]", re.UNICODE)  # BPE-ish: words + punct marks
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")

# tiny per-language stopword inventories for the n-gram/stopword heuristic
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is that it for on with as was at by an be this have from or".split()),
    "de": frozenset("der die das und ist nicht ich sie mit den von zu ein eine im für auf des".split()),
    "fr": frozenset("le la les de des et un une est pour dans que qui sur au avec ne pas ce".split()),
    "es": frozenset("el la los las de y un una es en que por para con no se del al como".split()),
    "it": frozenset("il la le di e un una è che per in non con del alla dei sono".split()),
}


def token_count(text: str) -> tuple[int, int]:
    """(whitespace_tokens, bpe_ish_tokens): whitespace split of trimmed
    text, and a word/punctuation regex count approximating BPE-scale
    token inflation."""
    stripped = text.strip()
    ws = len([t for t in WS_RE.split(stripped) if t]) if stripped else 0
    bpe = len(_WORD_RE.findall(text))
    return ws, bpe


def quality_stats(text: str) -> dict[str, float]:
    """Length / punctuation / digit / stopword / uppercase ratios — the
    standard cheap quality heuristics for corpus filtering."""
    n = len(text)
    if n == 0:
        return {
            "n_chars": 0, "n_tokens": 0, "punct_ratio": 0.0, "digit_ratio": 0.0,
            "stopword_ratio": 0.0, "upper_ratio": 0.0, "mean_token_len": 0.0,
        }
    toks = [t for t in WS_RE.split(text.strip()) if t]
    low = [t.lower() for t in toks]
    stop = _LANG_STOPWORDS["en"]
    return {
        "n_chars": float(n),
        "n_tokens": float(len(toks)),
        "punct_ratio": len(_PUNCT_RE.findall(text)) / n,
        "digit_ratio": len(_DIGIT_RE.findall(text)) / n,
        "stopword_ratio": (sum(t in stop for t in low) / len(toks)) if toks else 0.0,
        "upper_ratio": sum(c.isupper() for c in text) / n,
        "mean_token_len": (sum(len(t) for t in toks) / len(toks)) if toks else 0.0,
    }


def lang_id(text: str) -> tuple[str, float]:
    """Stopword-profile language heuristic: the language whose stopword
    inventory covers the largest share of tokens. Returns (lang, score);
    ('und', 0.0) when nothing matches."""
    toks = [t.lower() for t in WS_RE.split(text.strip()) if t]
    if not toks:
        return "und", 0.0
    best, best_score = "und", 0.0
    for lang, stop in _LANG_STOPWORDS.items():
        score = sum(t in stop for t in toks) / len(toks)
        if score > best_score:
            best, best_score = lang, score
    return (best, best_score) if best_score > 0.03 else ("und", best_score)


def md5_fingerprint(text: str) -> str:
    """Exact content fingerprint (hex md5) — SQL-oracle-able
    (DuckDB ``md5``)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def winnow_fingerprint(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    rolling-hash k-grams, keep the minimum hash of each window (rightmost
    on ties). Sorted unique selected hashes = the fingerprint."""
    n = len(text)
    if n < k:
        return [zlib.crc32(text.encode("utf-8"))] if n else []
    hashes = np.array(
        [zlib.crc32(text[i : i + k].encode("utf-8")) for i in range(n - k + 1)],
        dtype=np.int64,
    )
    if len(hashes) <= window:
        return sorted({int(hashes.min())})
    sel: set[int] = set()
    for i in range(len(hashes) - window + 1):
        w = hashes[i : i + window]
        sel.add(int(w[::-1].min()))  # rightmost min via reversed argmin
    return sorted(sel)


# polynomial rolling-hash base for char_shingles (odd -> invertible in
# Z/2^64; wraparound multiplication is the modulus)
_SHINGLE_BASE = np.uint64(0x9E3779B97F4A7C15)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-character shingles (uint64, unique, sorted).

    Vectorized: the UTF-8 bytes become one numpy array and every k-byte
    window is hashed at once with a polynomial multiply-accumulate in
    uint64 (natural wraparound), instead of one zlib.crc32 call per
    window. ~50x faster on kilobyte documents; the hash family changed
    from crc32 to a 64-bit polynomial (more collision headroom)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    with np.errstate(over="ignore"):
        if n < k:
            if n == 0:
                return np.empty(0, dtype=np.uint64)
            acc = np.uint64(0)
            for b in data:
                acc = acc * _SHINGLE_BASE + np.uint64(b) + np.uint64(1)
            return np.array([acc], dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        # Horner weights: h = sum (b_i + 1) * B^(k-1-i); +1 salt so
        # leading NULs still contribute; uint64 wraparound is the modulus
        weights = _SHINGLE_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        hs = ((win + np.uint64(1)) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(hs)


def minhash_perms(n_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift hash family parameters: odd multipliers + offsets
    in uint64 (vectorizable; wraparound multiplication is the modulus)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**63, size=n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm MinHash values via multiply-shift universal hashing
    ((a*x + b) mod 2^64, a odd) — one broadcasted uint64 matrix op.
    Empty shingle set -> all MAX (never collides)."""
    n_perm = len(a)
    if len(shingles) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = a[:, None] * shingles[None, :].astype(np.uint64) + b[:, None]
    return h.min(axis=1)


def minhash_band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """Split the signature into bands; hash each band (LSH buckets)."""
    rows = len(sig) // n_bands
    return [
        zlib.crc32(sig[i * rows : (i + 1) * rows].tobytes())
        for i in range(n_bands)
    ]


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (Charikar 2002).

    Token hash = first 8 bytes of md5, big-endian — chosen so a SQL
    oracle can recompute the identical fingerprint:
    ``('0x' || substr(md5(t), 1, 16))::UBIGINT`` in DuckDB yields
    exactly this value, which makes the whole SimHash dedup family
    value-verifiable end-to-end (see oracle_sql()["simhash_clusters"]).
    """
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for t in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        )
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    """Hamming distance of two 64-bit patterns. Inputs are masked to 64
    bits first: a uint64 fingerprint that round-tripped through a signed
    int64 column arrives as a NEGATIVE int, and ``bin()`` of a negative
    counts magnitude bits (wrong answer) — masking restores the
    bit pattern regardless of how the value was transported."""
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))
