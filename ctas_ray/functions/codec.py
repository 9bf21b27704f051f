"""[graft] Gorilla-style timeseries compression: delta-of-delta timestamps
+ XOR float values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 — public algorithm; see PAPERS.md).

No equivalent exists in the reference (pure in-memory R); mandated by
BASELINE.json north_star. Encoded blobs are stored per
(conv_id, channel[, chunk]) as a ``binary`` Parquet column; decoding
must round-trip (ts, value) EXACTLY — including NaN payloads, -0.0 and
denormals — which the property tests in tests/test_codec.py pin.

Bit layout (adapted to int64 microsecond timestamps):

timestamps: first ts as raw 64 bits; then per point, D = delta-of-delta:
  D == 0                  -> '0'
  -63   <= D <= 64        -> '10'   + 7-bit  (D + 63)
  -255  <= D <= 256       -> '110'  + 9-bit  (D + 255)
  -2047 <= D <= 2048      -> '1110' + 12-bit (D + 2047)
  else                    -> '1111' + 64-bit two's-complement D
(The first point's delta is encoded as a delta-of-delta against an
implicit previous delta of 0.)

values: first value as raw 64 bits; then per point, X = bits ^ prev_bits:
  X == 0 -> '0'
  else   -> '1' then
    fits in previous (leading, meaningful) window -> '0' + meaningful bits
    else -> '1' + 5-bit leading-zero count + 6-bit (meaningful_len - 1)
                + meaningful bits

Encoder policies (format-compatible, decoder-agnostic):
- block windows: nonzero-XOR points share one '11' window per
  VAL_WINDOW_BLOCK points (min lead / min trail), the rest reuse — this
  makes every encode decision a numpy expression (no per-point loop).
- per-stream raw: a stream whose estimated encoded size is within 5% of
  raw is stored as a memcpy, flagged in the high bit of its uint32
  length word (the legacy whole-blob _RAW_MARKER still decodes).

v2 layout (DEFAULT since round 3; bit 30 of a stream's length word):
the same Gorilla semantics rearranged structure-of-arrays so DECODE is
fully vectorized — the v1 interleaved prefix-code stream forces a
per-point Python scan on the tier/blob READ path, which a 100x scale-up
hits on every query over archived series. Each v2 stream is
[first point: 8 bytes MSB-first]
[code section: one 2-bit code per remaining point, 4 codes/byte]
[window section (values only): 11 bits per '3' code — 5-bit lead +
 6-bit (mlen-1), the VAL_WINDOW_BLOCK policy unchanged]
[payload section: the variable-width fields, widths fully determined
 by the code + window sections]
with each section byte-aligned. Decoding is: unpack codes (vectorized),
cumsum widths, one gather for all payloads, cumsum / xor-accumulate to
reconstruct — no per-point control flow. Timestamp codes: 0 = dod 0,
1 = 7-bit dod+63, 2 = 12-bit dod+2047, 3 = raw 64-bit. Value codes:
0 = xor 0, 2 = window reuse, 3 = new window. v1 blobs still decode.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_series", "encode_series_batch", "decode_series", "encode_text_block", "decode_text_block"]

_MASK64 = (1 << 64) - 1


def encode_text_block(texts: list[str], level: int = 6) -> bytes:
    """[graft] Per-turn TEXT block codec: length-prefixed UTF-8
    concatenation, zlib-compressed. Paired with the stable
    (conv_id, turn_idx) ordering, ``decode_text_block(encode(...))``
    returns every turn's text BYTE-EQUAL — the per-row invariant from
    BASELINE.json input_hint, enforced in tests and by the optional
    in-pipeline round-trip check.

    Layout: [uint32 n][zlib(uint32 byte_len x n || concat utf-8)] —
    the length table lives inside the compressed stream so per-turn
    framing overhead compresses away.
    """
    import zlib

    encoded = [t.encode("utf-8") for t in texts]
    lens = b"".join(len(e).to_bytes(4, "little") for e in encoded)
    return len(encoded).to_bytes(4, "little") + zlib.compress(
        lens + b"".join(encoded), level
    )


def decode_text_block(blob: bytes) -> list[str]:
    """Inverse of :func:`encode_text_block`; exact round-trip."""
    import zlib

    n = int.from_bytes(blob[0:4], "little")
    payload = zlib.decompress(blob[4:])
    lens = [
        int.from_bytes(payload[4 * i : 4 * i + 4], "little") for i in range(n)
    ]
    out = []
    pos = 4 * n
    for ln in lens:
        out.append(payload[pos : pos + ln].decode("utf-8"))
        pos += ln
    return out


class _BitReader:
    """Buffered MSB-first bit reader: refills an int accumulator 8 bytes
    at a time (one int.from_bytes per 64 bits instead of per field) and
    supports cheap peek/consume for variable-length control codes.
    Peeks past the end of the stream see phantom zero bits (safe: the
    decoder's loop counts are known, so phantom bits are never consumed
    as data)."""

    __slots__ = ("data", "byte_pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte_pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, bits: int) -> None:
        while self.nbits < bits:
            take = min(8, len(self.data) - self.byte_pos)
            if take <= 0:  # phantom zero padding past stream end
                self.acc <<= bits - self.nbits
                self.nbits = bits
                return
            chunk = int.from_bytes(
                self.data[self.byte_pos : self.byte_pos + take], "big"
            )
            self.byte_pos += take
            self.acc = (self.acc << (take << 3)) | chunk
            self.nbits += take << 3

    def read(self, bits: int) -> int:
        if self.nbits < bits:
            self._fill(bits)
        self.nbits -= bits
        out = (self.acc >> self.nbits) & ((1 << bits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def peek(self, bits: int) -> int:
        if self.nbits < bits:
            self._fill(bits)
        return (self.acc >> (self.nbits - bits)) & ((1 << bits) - 1)

    def skip(self, bits: int) -> None:
        if self.nbits < bits:
            self._fill(bits)
        self.nbits -= bits
        self.acc &= (1 << self.nbits) - 1

    def zero_run(self, limit: int) -> int:
        """Consume up to ``limit`` consecutive '0' bits; returns how many
        were consumed (stops early at the first '1'). Mirrors the
        encoder's run-length zero emission."""
        count = 0
        while count < limit:
            if self.nbits == 0:
                if self.byte_pos >= len(self.data):
                    break  # stream exhausted: remaining run is implicit
                self._fill(1)
            if self.acc == 0:
                take = min(self.nbits, limit - count)
            else:
                lead = self.nbits - self.acc.bit_length()
                take = min(lead, limit - count)
                if take == 0:
                    break  # '1' bit at the head
            self.nbits -= take
            # acc's top bits were zero; low bits unchanged
            count += take
        return count


_RAW_MARKER = (0xFFFFFFFF).to_bytes(4, "little") + (0xFFFFFFFF).to_bytes(4, "little")


def _analyze(ts: np.ndarray, vals: np.ndarray):
    """One vectorized pass producing everything the encoder needs:
    (dod int64 [0]=0, xor uint64 [0]=0, lead, trail, est_bits).
    est_bits is a no-window-reuse upper bound used only for the
    raw-storage fallback decision (overestimate biases toward raw)."""
    n = len(ts)
    tsu = ts.view(np.uint64)
    with np.errstate(over="ignore"):
        delta = np.empty(n, dtype=np.uint64)
        delta[0] = 0
        delta[1:] = tsu[1:] - tsu[:-1]
        dod_u = np.empty(n, dtype=np.uint64)
        dod_u[0] = 0
        dod_u[1:] = delta[1:] - delta[:-1]
    dod = dod_u.view(np.int64)
    d1 = dod[1:]
    ts_bits = 64 + int(
        np.select(
            [d1 == 0, (d1 >= -63) & (d1 <= 64), (d1 >= -255) & (d1 <= 256),
             (d1 >= -2047) & (d1 <= 2048)],
            [1, 9, 12, 16],
            default=68,
        ).sum()
    )
    bits_arr = vals.view(np.uint64)
    with np.errstate(over="ignore"):
        xor = np.empty(n, dtype=np.uint64)
        xor[0] = 0
        xor[1:] = bits_arr[1:] ^ bits_arr[:-1]
    lead_arr = np.minimum(_clz64(xor), 31)  # 5-bit field cap (paper)
    low_isolated = xor & (~xor + np.uint64(1))  # x & -x
    trail_arr = 63 - _clz64(low_isolated)  # ctz (x==0 -> -1, unused)
    mlen1 = (64 - lead_arr - trail_arr)[1:]
    val_bits = 64 + int(np.where(xor[1:] == 0, 1, 13 + mlen1).sum())
    return dod, xor, lead_arr, trail_arr, ts_bits, val_bits


_CLZ8 = np.array(
    [8] + [7 - int(i).bit_length() + 1 for i in range(1, 256)], dtype=np.int64
)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x == 0 -> 64):
    byte-decompose (little-endian), find the most-significant nonzero
    byte with one argmax, finish with an 8-bit LUT — ~3 byte-wide passes
    instead of the 6-step binary-search shift ladder."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)
    rev_nz = b[:, ::-1] != 0  # column 0 = most significant byte
    k = rev_nz.argmax(axis=1).astype(np.int64)  # all-zero rows -> 0
    msb_byte = b[np.arange(len(b)), 7 - k]
    lead = 8 * k + _CLZ8[msb_byte]
    lead[x == 0] = 64
    return lead


def _pack_fields(
    offsets: np.ndarray, widths: np.ndarray, values: np.ndarray, total_bits: int
) -> bytes:
    """Vectorized variable-width bit packing: OR each field's bytes into
    an MSB-first bitstream buffer. Fields must be disjoint bit ranges
    with width <= 64 and values already masked to their width; zero-run
    gaps need no fields at all (the buffer starts zeroed).

    Per k in 0..max_span: every field contributes its k-th byte
    (np.bitwise_or.at handles fields sharing a boundary byte)."""
    nbytes = (total_bits + 7) >> 3
    buf = np.zeros(nbytes, dtype=np.uint8)
    if len(offsets) == 0:
        return buf.tobytes()
    start_byte = offsets >> 3
    bib = offsets & 7  # bit offset within the first byte
    span = (bib + widths + 7) >> 3
    # sort by span DESCENDING: per byte-slot k the active fields are a
    # shrinking PREFIX — a lone 64-bit field never drags every narrow
    # field through 9 masked passes
    order = np.argsort(-span, kind="stable")
    sb = start_byte[order]
    bb = bib[order]
    w = widths[order]
    v = values[order].astype(np.uint64, copy=False)
    span_s = span[order]
    max_span = int(span_s[0])
    # count of fields with span > k, for prefix slicing
    hist = np.bincount(span_s, minlength=max_span + 1)
    alive = len(span_s) - np.cumsum(hist)  # alive[k] = #(span > k)
    for k in range(max_span):
        c = int(alive[k])
        if c == 0:
            break
        shift = w[:c] + bb[:c] - 8 * (k + 1)
        vs = v[:c]
        rsh = np.clip(shift, 0, None).astype(np.uint64)
        lsh = np.clip(-shift, 0, None).astype(np.uint64)  # <= 7 by layout
        byte = np.where(shift >= 0, vs >> rsh, vs << lsh) & np.uint64(0xFF)
        np.bitwise_or.at(buf, sb[:c] + k, byte.astype(np.uint8))
    return buf.tobytes()


def _pack_stream(
    n: int,
    first_word: np.ndarray,
    nz: np.ndarray,
    ctrl_v: np.ndarray,
    ctrl_w: np.ndarray,
    pay_v: np.ndarray,
    pay_w: np.ndarray,
) -> bytes:
    """Shared stream layout: compute every field's bit offset around the
    zero-run gaps, MERGE control+payload into one field where the pair
    fits in 64 bits (halves the field count on the hot path), pack."""
    m = len(nz)
    gaps = np.empty(m, dtype=np.int64)
    gaps[0] = nz[0] - 1
    gaps[1:] = np.diff(nz) - 1
    stride = gaps + ctrl_w + pay_w
    ends = np.cumsum(stride)
    ctrl_off = 64 + ends - stride + gaps
    total = 64 + int(ends[-1]) + (n - 1 - int(nz[-1]))
    tot_w = ctrl_w + pay_w
    mergeable = tot_w <= 64
    shift = np.where(mergeable, pay_w, 0).astype(np.uint64)
    merged_v = (ctrl_v << shift) | np.where(mergeable, pay_v, np.uint64(0))
    offs = [np.array([0], dtype=np.int64), ctrl_off[mergeable]]
    widths = [np.array([64], dtype=np.int64), tot_w[mergeable]]
    vals = [first_word, merged_v[mergeable]]
    nm = ~mergeable
    if nm.any():
        offs += [ctrl_off[nm], ctrl_off[nm] + ctrl_w[nm]]
        widths += [ctrl_w[nm], pay_w[nm]]
        vals += [ctrl_v[nm], pay_v[nm]]
    return _pack_fields(
        np.concatenate(offs), np.concatenate(widths), np.concatenate(vals), total
    )


_TS_CTRL_W = np.array([2, 3, 4, 4], dtype=np.int64)
_TS_CTRL_V = np.array([0b10, 0b110, 0b1110, 0b1111], dtype=np.uint64)
_TS_PAY_W = np.array([7, 9, 12, 64], dtype=np.int64)
_TS_PAY_OFF = np.array([63, 255, 2047, 0], dtype=np.int64)


def _encode_ts_stream(ts: np.ndarray, dod: np.ndarray) -> bytes:
    """Timestamp bitstream, fully vectorized: classify each nonzero
    delta-of-delta, lay out (control, payload) subfields around the
    zero-run gaps, pack in one buffer pass."""
    n = len(ts)
    first = np.array([np.uint64(ts.view(np.uint64)[0])])
    nz = np.nonzero(dod[1:])[0] + 1
    m = len(nz)
    if m == 0:
        total = 64 + max(0, n - 1)
        return _pack_fields(
            np.array([0], dtype=np.int64), np.array([64], dtype=np.int64),
            first, total,
        )
    d = dod[nz]
    cls = np.select(
        [(d >= -63) & (d <= 64), (d >= -255) & (d <= 256), (d >= -2047) & (d <= 2048)],
        [0, 1, 2],
        default=3,
    )
    ctrl_w = _TS_CTRL_W[cls]
    ctrl_v = _TS_CTRL_V[cls]
    pay_w = _TS_PAY_W[cls]
    pay_v = (d + _TS_PAY_OFF[cls]).view(np.uint64)  # cls3: two's complement
    return _pack_stream(n, first, nz, ctrl_v, ctrl_w, pay_v, pay_w)


VAL_WINDOW_BLOCK = 32  # nonzero-XOR points sharing one '11' window


def _encode_val_stream(
    vals: np.ndarray, xor: np.ndarray, lead_arr: np.ndarray, trail_arr: np.ndarray
) -> bytes:
    """Value bitstream with a VECTORIZED window policy: nonzero-XOR
    points are grouped into blocks of VAL_WINDOW_BLOCK; each block's
    first point emits a '11' window covering the whole block
    (min lead, min trail via reduceat) and the rest emit 2-bit '10'
    reuse codes. Format-identical to classic Gorilla reuse — the window
    choice is an encoder policy the unchanged decoder simply follows —
    but every per-point decision becomes a numpy expression (the classic
    point-by-point reuse scan is inherently sequential). Costs ~11
    control bits per block and a slightly wider shared window; saves the
    Python loop that dominated encode time on dense-XOR series."""
    n = len(vals)
    first = np.array([vals.view(np.uint64)[0]])
    nz = np.nonzero(xor[1:])[0] + 1
    m = len(nz)
    if m == 0:
        total = 64 + max(0, n - 1)
        return _pack_fields(
            np.array([0], dtype=np.int64), np.array([64], dtype=np.int64),
            first, total,
        )
    leads = lead_arr[nz]
    trails = trail_arr[nz]
    block_starts = np.arange(0, m, VAL_WINDOW_BLOCK)
    blk_lead = np.minimum.reduceat(leads, block_starts)
    blk_trail = np.minimum.reduceat(trails, block_starts)
    blk_mlen = 64 - blk_lead - blk_trail  # >= 1 (xor != 0 per point)
    blk_of = np.arange(m) // VAL_WINDOW_BLOCK
    is_first = np.zeros(m, dtype=bool)
    is_first[block_starts] = True
    mlen_pt = blk_mlen[blk_of]
    head_v = (
        np.uint64(0b11 << 11)
        | (blk_lead[blk_of].astype(np.uint64) << np.uint64(6))
        | (mlen_pt - 1).astype(np.uint64)
    )
    ctrl_v = np.where(is_first, head_v, np.uint64(0b10))
    ctrl_w = np.where(is_first, 13, 2).astype(np.int64)
    pay_w = mlen_pt.astype(np.int64)
    pay_v = xor[nz] >> blk_trail[blk_of].astype(np.uint64)
    return _pack_stream(n, first, nz, ctrl_v, ctrl_w, pay_v, pay_w)


_RAW_FLAG = 0x80000000  # high bit of a stream's uint32 byte length
_V2_FLAG = 0x40000000  # bit 30: structure-of-arrays v2 stream layout
_LEN_MASK = 0x3FFFFFFF


def _stream_word(nbytes: int, flags: int = 0) -> int:
    """Build a stream length word, rejecting lengths that would alias
    the V2/RAW flag bits (>= 2^30 bytes ~ 134M points in one RAW
    stream): the failure must be loud at ENCODE time, not a silent
    mis-decode later. Series that large must be chunked upstream (the
    rollup engine's conversation chunk-split already guarantees this
    on the tier path)."""
    if nbytes > _LEN_MASK:
        raise ValueError(
            f"codec stream of {nbytes} bytes exceeds the 2^30-1 length "
            "limit (bits 30/31 of the length word are the V2/RAW "
            "flags); chunk the series before encoding"
        )
    return nbytes | flags


def encode_series(
    ts_us: np.ndarray, values: np.ndarray, version: int = 2
) -> bytes:
    """Encode parallel (int64 microsecond, float64) arrays into one blob.

    Layout: [uint32 count][uint32 ts_len][uint32 val_len][timestamp
    stream][value stream]; each stream is byte-aligned. A stream whose
    estimated encoded size is within 5% of raw is stored RAW (memcpy)
    instead, flagged by the high bit of its length word — a series with
    near-random timestamps but compressible values (or vice versa) pays
    bit packing only where it wins. (Real TSDBs do the same; decode
    stays exact either way.)

    Fully vectorized: per-point analysis (XOR, leading/trailing zeros,
    delta-of-delta bucketing) in one numpy pass, then variable-width bit
    packing as a buffered OR over (offset, width, value) field arrays
    (_pack_fields); the value stream uses the block-window policy
    (VAL_WINDOW_BLOCK), so no per-point Python loop remains."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    if version == 2:
        return _encode_batch_v2(ts, vals, np.array([0], dtype=np.int64))[0]
    if n == 0:
        z = (0).to_bytes(4, "little")
        return z + z + z
    dod, xor, lead_arr, trail_arr, ts_bits, val_bits = _analyze(ts, vals)
    if ts_bits >= n * 64 * 0.95:
        tb = ts.tobytes()
        t_word = _stream_word(len(tb), _RAW_FLAG)
    else:
        tb = _encode_ts_stream(ts, dod)
        t_word = _stream_word(len(tb))
    if val_bits >= n * 64 * 0.95:
        vb = vals.tobytes()
        v_word = _stream_word(len(vb), _RAW_FLAG)
    else:
        vb = _encode_val_stream(vals, xor, lead_arr, trail_arr)
        v_word = _stream_word(len(vb))
    head = (
        n.to_bytes(4, "little")
        + t_word.to_bytes(4, "little")
        + v_word.to_bytes(4, "little")
    )
    return head + tb + vb


def _seg_pack_stream(
    kind: str,
    n_total: int,
    seg_starts: np.ndarray,
    seg_len: np.ndarray,
    enc_mask: np.ndarray,
    nz: np.ndarray,
    seg_of_nz: np.ndarray,
    ctrl_v: np.ndarray,
    ctrl_w: np.ndarray,
    pay_v: np.ndarray,
    pay_w: np.ndarray,
    first_words: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, bytes]:
    """Pack ONE stream kind (ts or val) for every encoded segment of a
    batch into a single buffer, each segment's stream byte-aligned at
    its own base — one _pack_fields call for the whole batch instead of
    one per series. Returns (byte_len_by_seg, byte_base_by_seg, buffer);
    entries for non-encoded segments are 0. Byte-identical per segment
    to _pack_stream on that segment alone."""
    S = len(seg_starts)
    keep = enc_mask[seg_of_nz]
    nz = nz[keep]
    seg_of_nz = seg_of_nz[keep]
    ctrl_v, ctrl_w = ctrl_v[keep], ctrl_w[keep]
    pay_v, pay_w = pay_v[keep], pay_w[keep]

    total_bits = np.zeros(S, dtype=np.int64)
    # segments with no nonzero entries: first word + one '0' per point
    total_bits[enc_mask] = 64 + np.maximum(0, seg_len[enc_mask] - 1)

    m = len(nz)
    if m:
        pos_local = nz - seg_starts[seg_of_nz]
        first_ent = np.r_[True, seg_of_nz[1:] != seg_of_nz[:-1]]
        gaps = np.empty(m, dtype=np.int64)
        gaps[1:] = pos_local[1:] - pos_local[:-1] - 1
        gaps[first_ent] = pos_local[first_ent] - 1
        stride = gaps + ctrl_w + pay_w
        cs = np.cumsum(stride)
        first_idx = np.nonzero(first_ent)[0]
        base = (cs[first_idx] - stride[first_idx])[
            np.cumsum(first_ent.astype(np.int64)) - 1
        ]
        ends_local = cs - base
        ctrl_off_local = 64 + ends_local - stride + gaps
        last_ent = np.r_[first_ent[1:], True]
        last_idx = np.nonzero(last_ent)[0]
        segs_with_nz = seg_of_nz[last_idx]
        total_bits[segs_with_nz] = (
            64
            + ends_local[last_idx]
            + (seg_len[segs_with_nz] - 1 - pos_local[last_idx])
        )

    byte_len = np.where(enc_mask, (total_bits + 7) >> 3, 0)
    byte_base = np.r_[0, np.cumsum(byte_len)[:-1]]
    buf_bytes = int(byte_len.sum())
    base_bits_by_seg = byte_base * 8

    offs = [base_bits_by_seg[enc_mask]]
    widths = [np.full(int(enc_mask.sum()), 64, dtype=np.int64)]
    vals = [first_words[enc_mask]]
    if m:
        off_global = base_bits_by_seg[seg_of_nz] + ctrl_off_local
        tot_w = ctrl_w + pay_w
        mergeable = tot_w <= 64
        shift = np.where(mergeable, pay_w, 0).astype(np.uint64)
        merged_v = (ctrl_v << shift) | np.where(mergeable, pay_v, np.uint64(0))
        offs.append(off_global[mergeable])
        widths.append(tot_w[mergeable])
        vals.append(merged_v[mergeable])
        nm = ~mergeable
        if nm.any():
            offs += [off_global[nm], off_global[nm] + ctrl_w[nm]]
            widths += [ctrl_w[nm], pay_w[nm]]
            vals += [ctrl_v[nm], pay_v[nm]]
    buf = _pack_fields(
        np.concatenate(offs), np.concatenate(widths), np.concatenate(vals),
        buf_bytes * 8,
    )
    return byte_len, byte_base, buf


def encode_series_batch(
    ts_all: np.ndarray,
    vals_all: np.ndarray,
    seg_starts: np.ndarray,
    version: int = 2,
) -> list[bytes]:
    """Encode MANY series at once: ``ts_all``/``vals_all`` are all the
    series concatenated, ``seg_starts`` their start indices. Returns one
    blob per segment, each BYTE-IDENTICAL to ``encode_series`` on that
    segment's slice (pinned by tests) — but the analysis, classification
    and bit packing run as single numpy passes over the whole batch, so
    the per-series fixed cost (~1ms of small-array setup per
    encode_series call) is paid once per PARTITION. This is the rollup
    hot path: a partition holds hundreds of 1k-point series, where
    per-call overhead dominated encode time."""
    ts_all = np.asarray(ts_all, dtype=np.int64)
    vals_all = np.asarray(vals_all, dtype=np.float64)
    n_total = len(ts_all)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if version == 2:
        return _encode_batch_v2(ts_all, vals_all, seg_starts)
    S = len(seg_starts)
    if S == 0:
        return []
    seg_ends = np.r_[seg_starts[1:], n_total]
    seg_len = seg_ends - seg_starts
    empty_blob = (0).to_bytes(4, "little") * 3
    if n_total == 0:
        return [empty_blob] * S

    tsu = ts_all.view(np.uint64)
    bits = vals_all.view(np.uint64)
    ne_starts = seg_starts[seg_len > 0]
    with np.errstate(over="ignore"):
        delta = np.empty(n_total, dtype=np.uint64)
        if n_total:
            delta[0] = 0
            delta[1:] = tsu[1:] - tsu[:-1]
            delta[ne_starts] = 0
        dod = np.empty(n_total, dtype=np.uint64)
        if n_total:
            dod[0] = 0
            dod[1:] = delta[1:] - delta[:-1]
            dod[ne_starts] = 0
        xor = np.empty(n_total, dtype=np.uint64)
        if n_total:
            xor[0] = 0
            xor[1:] = bits[1:] ^ bits[:-1]
            xor[ne_starts] = 0
    dod_i = dod.view(np.int64)
    lead_arr = np.minimum(_clz64(xor), 31)
    low_isolated = xor & (~xor + np.uint64(1))
    trail_arr = 63 - _clz64(low_isolated)

    seg_of = np.repeat(np.arange(S, dtype=np.int64), seg_len)
    is_start = np.zeros(n_total, dtype=bool)
    is_start[ne_starts] = True

    # per-segment estimated bits (same formulas as _analyze)
    c_ts = np.select(
        [is_start, dod_i == 0, (dod_i >= -63) & (dod_i <= 64),
         (dod_i >= -255) & (dod_i <= 256), (dod_i >= -2047) & (dod_i <= 2048)],
        [0, 1, 9, 12, 16],
        default=68,
    )
    mlen_pt_est = 64 - lead_arr - trail_arr
    c_val = np.select(
        [is_start, xor == 0], [0, 1], default=13 + mlen_pt_est
    )
    red_starts = seg_starts[seg_len > 0]
    ts_bits = np.zeros(S, dtype=np.int64)
    val_bits = np.zeros(S, dtype=np.int64)
    if len(red_starts):
        ts_bits[seg_len > 0] = 64 + np.add.reduceat(c_ts, red_starts)
        val_bits[seg_len > 0] = 64 + np.add.reduceat(c_val, red_starts)

    ts_raw = ts_bits >= seg_len * 64 * 0.95
    val_raw = val_bits >= seg_len * 64 * 0.95
    nonempty = seg_len > 0
    ts_enc = nonempty & ~ts_raw
    val_enc = nonempty & ~val_raw

    # ---- ts stream fields over all nonzero dod entries ----
    nz_t = np.nonzero(dod)[0]
    seg_t = seg_of[nz_t]
    d = dod_i[nz_t]
    cls = np.select(
        [(d >= -63) & (d <= 64), (d >= -255) & (d <= 256), (d >= -2047) & (d <= 2048)],
        [0, 1, 2],
        default=3,
    )
    t_len, t_base, t_buf = _seg_pack_stream(
        "ts", n_total, seg_starts, seg_len, ts_enc,
        nz_t, seg_t,
        _TS_CTRL_V[cls], _TS_CTRL_W[cls],
        (d + _TS_PAY_OFF[cls]).view(np.uint64), _TS_PAY_W[cls],
        np.where(nonempty, tsu[np.minimum(seg_starts, max(n_total - 1, 0))], 0),
    )

    # ---- val stream fields: block-window policy with per-segment
    # ordinal reset (each block lies inside one segment) ----
    nz_v = np.nonzero(xor)[0]
    seg_v = seg_of[nz_v]
    mv = len(nz_v)
    if mv:
        first_ent_v = np.r_[True, seg_v[1:] != seg_v[:-1]]
        ent_base = np.nonzero(first_ent_v)[0][
            np.cumsum(first_ent_v.astype(np.int64)) - 1
        ]
        ordv = np.arange(mv, dtype=np.int64) - ent_base
        is_blk = (ordv % VAL_WINDOW_BLOCK) == 0
        blk_starts = np.nonzero(is_blk)[0]
        leads = lead_arr[nz_v]
        trails = trail_arr[nz_v]
        blk_lead = np.minimum.reduceat(leads, blk_starts)
        blk_trail = np.minimum.reduceat(trails, blk_starts)
        blk_mlen = 64 - blk_lead - blk_trail
        blk_id = np.cumsum(is_blk.astype(np.int64)) - 1
        mlen_pt = blk_mlen[blk_id]
        head_v = (
            np.uint64(0b11 << 11)
            | (blk_lead[blk_id].astype(np.uint64) << np.uint64(6))
            | (mlen_pt - 1).astype(np.uint64)
        )
        v_ctrl_v = np.where(is_blk, head_v, np.uint64(0b10))
        v_ctrl_w = np.where(is_blk, 13, 2).astype(np.int64)
        v_pay_w = mlen_pt.astype(np.int64)
        v_pay_v = xor[nz_v] >> blk_trail[blk_id].astype(np.uint64)
    else:
        v_ctrl_v = np.empty(0, dtype=np.uint64)
        v_ctrl_w = np.empty(0, dtype=np.int64)
        v_pay_v = np.empty(0, dtype=np.uint64)
        v_pay_w = np.empty(0, dtype=np.int64)
    v_len, v_base, v_buf = _seg_pack_stream(
        "val", n_total, seg_starts, seg_len, val_enc,
        nz_v, seg_v, v_ctrl_v, v_ctrl_w, v_pay_v, v_pay_w,
        np.where(nonempty, bits[np.minimum(seg_starts, max(n_total - 1, 0))], 0),
    )

    # ---- assemble per-segment blobs ----
    out: list[bytes] = []
    for s in range(S):
        n_s = int(seg_len[s])
        if n_s == 0:
            out.append(empty_blob)
            continue
        a, b = int(seg_starts[s]), int(seg_ends[s])
        if ts_raw[s]:
            tb = ts_all[a:b].tobytes()
            t_word = _stream_word(len(tb), _RAW_FLAG)
        else:
            tb = t_buf[int(t_base[s]) : int(t_base[s]) + int(t_len[s])]
            t_word = int(t_len[s])
        if val_raw[s]:
            vb = vals_all[a:b].tobytes()
            v_word = _stream_word(len(vb), _RAW_FLAG)
        else:
            vb = v_buf[int(v_base[s]) : int(v_base[s]) + int(v_len[s])]
            v_word = int(v_len[s])
        out.append(
            n_s.to_bytes(4, "little")
            + t_word.to_bytes(4, "little")
            + v_word.to_bytes(4, "little")
            + tb
            + vb
        )
    return out


def decode_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_series`; exact round-trip. Accepts both
    per-stream raw flags and the legacy whole-blob _RAW_MARKER."""
    n = int.from_bytes(blob[0:4], "little")
    if blob[4:12] == _RAW_MARKER:
        ts = np.frombuffer(blob[12 : 12 + 8 * n], dtype=np.int64).copy()
        vals = np.frombuffer(blob[12 + 8 * n :], dtype=np.float64).copy()
        return ts, vals
    t_word = int.from_bytes(blob[4:8], "little")
    v_word = int.from_bytes(blob[8:12], "little")
    ts_raw = bool(t_word & _RAW_FLAG)
    val_raw = bool(v_word & _RAW_FLAG)
    tlen = t_word & _LEN_MASK
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    if ts_raw:
        ts[:] = np.frombuffer(blob[12 : 12 + tlen], dtype=np.int64)
    if val_raw:
        vals[:] = np.frombuffer(blob[12 + tlen :], dtype=np.float64)
    if ts_raw and val_raw:
        return ts, vals
    if not ts_raw:
        tb = blob[12 : 12 + tlen]
        if t_word & _V2_FLAG:
            _decode_ts_v2(tb, ts, n)
        else:
            _decode_ts_stream(tb, ts, n)
    if not val_raw:
        vb = blob[12 + tlen :]
        if v_word & _V2_FLAG:
            _decode_val_v2(vb, vals, n)
        else:
            _decode_val_stream(vb, vals, n)
    return ts, vals


def _decode_ts_stream(data: bytes, ts: np.ndarray, n: int) -> None:
    tr = _BitReader(data)
    first = tr.read(64)
    ts[0] = first - (1 << 64) if first >= 1 << 63 else first
    prev_ts, prev_delta = first, 0  # mod-2^64 residues
    i = 1
    while i < n:
        prefix = tr.peek(4)  # '0xxx' | '10xx' | '110x' | '1110' | '1111'
        if prefix < 0b1000:
            # zero-run: constant delta -> arithmetic progression, filled
            # vectorized in wrapping uint64 (exact mod-2^64)
            run = tr.zero_run(n - i)
            if run == 0:
                run = 1
                tr.skip(1)
            with np.errstate(over="ignore"):
                steps = np.arange(1, run + 1, dtype=np.uint64)
                vals_u = np.uint64(prev_ts) + np.uint64(prev_delta) * steps
            ts[i : i + run] = vals_u.view(np.int64)
            prev_ts = int(vals_u[-1])
            i += run
            continue
        if prefix < 0b1100:
            tr.skip(2)
            dod = tr.read(7) - 63
        elif prefix < 0b1110:
            tr.skip(3)
            dod = tr.read(9) - 255
        elif prefix == 0b1110:
            tr.skip(4)
            dod = tr.read(12) - 2047
        else:
            tr.skip(4)
            dod = tr.read(64)
        prev_delta = (prev_delta + dod) & _MASK64
        prev_ts = (prev_ts + prev_delta) & _MASK64
        ts[i] = prev_ts - (1 << 64) if prev_ts >= 1 << 63 else prev_ts
        i += 1


def _decode_val_stream(data: bytes, vals: np.ndarray, n: int) -> None:
    vr = _BitReader(data)
    bits_out = np.empty(n, dtype=np.uint64)
    prev_bits = vr.read(64)
    bits_out[0] = prev_bits
    lead, mlen, trail = 0, 0, 64
    i = 1
    while i < n:
        ctrl = vr.peek(2)  # '0x' zero | '10' reuse | '11' new window
        if ctrl < 0b10:
            run = vr.zero_run(n - i)
            if run == 0:
                run = 1
                vr.skip(1)
            bits_out[i : i + run] = prev_bits
            i += run
            continue
        if ctrl == 0b10:
            vr.skip(2)
            x = vr.read(mlen) << trail
        else:
            head = vr.read(13)  # '11' + 5-bit lead + 6-bit (mlen-1)
            lead = (head >> 6) & 0x1F
            mlen = (head & 0x3F) + 1
            trail = 64 - lead - mlen
            x = vr.read(mlen) << trail
        prev_bits ^= x
        bits_out[i] = prev_bits
        i += 1
    vals[:] = bits_out.view(np.float64)


# ---------------------------------------------------------------------------
# v2: structure-of-arrays layout — vectorized DECODE (see module docstring)
# ---------------------------------------------------------------------------

_TS2_W = np.array([0, 7, 12, 64], dtype=np.int64)  # payload width per ts code


def _pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack 2-bit codes MSB-first, 4 per byte (vectorized reshape)."""
    m = len(codes)
    padded = np.zeros(((m + 3) // 4) * 4, dtype=np.uint8)
    padded[:m] = codes
    q = padded.reshape(-1, 4)
    return (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]


def _unpack_2bit(data: bytes | np.ndarray, m: int) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8, count=(m + 3) // 4)
    out = np.empty((len(b), 4), dtype=np.uint8)
    out[:, 0] = b >> 6
    out[:, 1] = (b >> 4) & 3
    out[:, 2] = (b >> 2) & 3
    out[:, 3] = b & 3
    return out.reshape(-1)[:m]


def _unpack_fields(
    data: bytes, offs_bits: np.ndarray, widths: np.ndarray
) -> np.ndarray:
    """Vectorized inverse of :func:`_pack_fields`: gather each field
    (width 1..64) from an MSB-first bitstream in one pass. A field
    spans at most 9 bytes; load 8 bytes + 1 spill byte per field via a
    sliding-window view, left-align, shift down."""
    if len(offs_bits) == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    pad = np.zeros(len(b) + 16, dtype=np.uint8)
    pad[: len(b)] = b
    win = np.lib.stride_tricks.sliding_window_view(pad, 9)
    sb = (offs_bits >> 3).astype(np.int64)
    bib = (offs_bits & 7).astype(np.uint64)
    w9 = win[sb].astype(np.uint64)  # (m, 9) gather
    hi = w9[:, 0]
    for j in range(1, 8):
        hi = (hi << np.uint64(8)) | w9[:, j]
    left = (hi << bib) | (w9[:, 8] >> (np.uint64(8) - bib))
    return left >> (np.uint64(64) - widths.astype(np.uint64))


def _within_seg_excl_cumsum(c: np.ndarray, seg_starts: np.ndarray,
                            seg_of: np.ndarray) -> np.ndarray:
    """Exclusive cumulative sum of ``c`` restarting at each segment."""
    cw = np.cumsum(c)
    excl = cw - c
    return excl - excl[seg_starts][seg_of]


def _encode_batch_v2(
    ts_all: np.ndarray, vals_all: np.ndarray, seg_starts: np.ndarray
) -> list[bytes]:
    """v2 batch encoder: one analysis pass + THREE _pack_fields calls
    (ts fields, val fields are packed per stream kind across ALL
    segments at per-segment byte-aligned bases). ``encode_series``
    v2 is this with a single segment, so single and batch outputs are
    byte-identical by construction."""
    ts_all = np.asarray(ts_all, dtype=np.int64)
    vals_all = np.asarray(vals_all, dtype=np.float64)
    n_total = len(ts_all)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    S = len(seg_starts)
    if S == 0:
        return []
    seg_ends = np.r_[seg_starts[1:], n_total]
    seg_len = seg_ends - seg_starts
    empty_blob = (0).to_bytes(4, "little") * 3
    if n_total == 0:
        return [empty_blob] * S

    tsu = ts_all.view(np.uint64)
    bits = vals_all.view(np.uint64)
    ne_starts = seg_starts[seg_len > 0]
    with np.errstate(over="ignore"):
        delta = np.empty(n_total, dtype=np.uint64)
        delta[0] = 0
        delta[1:] = tsu[1:] - tsu[:-1]
        delta[ne_starts] = 0
        dod = np.empty(n_total, dtype=np.uint64)
        dod[0] = 0
        dod[1:] = delta[1:] - delta[:-1]
        dod[ne_starts] = 0
        xor = np.empty(n_total, dtype=np.uint64)
        xor[0] = 0
        xor[1:] = bits[1:] ^ bits[:-1]
        xor[ne_starts] = 0
    dod_i = dod.view(np.int64)
    lead_arr = np.minimum(_clz64(xor), 31)
    low_isolated = xor & (~xor + np.uint64(1))
    trail_arr = 63 - _clz64(low_isolated)

    seg_of = np.repeat(np.arange(S, dtype=np.int64), seg_len)
    is_start = np.zeros(n_total, dtype=bool)
    is_start[ne_starts] = True
    has_code = ~is_start
    pidx = np.arange(n_total, dtype=np.int64) - seg_starts[seg_of]
    nonempty = seg_len > 0
    red = seg_starts[nonempty]

    def _per_seg(c: np.ndarray) -> np.ndarray:
        out = np.zeros(S, dtype=np.int64)
        if len(red):
            out[nonempty] = np.add.reduceat(c, red)
        return out

    # ---- ts classification ----
    t_cls = np.full(n_total, 3, dtype=np.uint8)
    t_cls[(dod_i >= -2047) & (dod_i <= 2048)] = 2
    t_cls[(dod_i >= -63) & (dod_i <= 64)] = 1
    t_cls[dod == 0] = 0
    t_w = _TS2_W[t_cls]
    t_w[is_start] = 0
    t_cls_m = np.where(has_code, t_cls, 0)
    with np.errstate(over="ignore"):
        t_pay = np.where(
            t_cls_m == 1, dod + np.uint64(63),
            np.where(t_cls_m == 2, dod + np.uint64(2047), dod),
        )
    ts_bits_est = 64 + 2 * np.maximum(seg_len - 1, 0) + _per_seg(t_w)
    ts_raw = ts_bits_est >= seg_len * 64 * 0.95
    ts_enc = nonempty & ~ts_raw

    # ---- val window policy (identical to v1: per-seg ordinal blocks) ----
    nz_v = np.nonzero(xor)[0]
    seg_v = seg_of[nz_v]
    mv = len(nz_v)
    v_code = np.zeros(n_total, dtype=np.uint8)
    mfull = np.zeros(n_total, dtype=np.int64)  # payload width per point
    v_pay = np.zeros(n_total, dtype=np.uint64)
    hfull = np.zeros(n_total, dtype=bool)  # head flag per point
    wlead = np.empty(0, dtype=np.int64)
    wmlen = np.empty(0, dtype=np.int64)
    if mv:
        first_ent_v = np.r_[True, seg_v[1:] != seg_v[:-1]]
        ent_base = np.nonzero(first_ent_v)[0][
            np.cumsum(first_ent_v.astype(np.int64)) - 1
        ]
        ordv = np.arange(mv, dtype=np.int64) - ent_base
        is_blk = (ordv % VAL_WINDOW_BLOCK) == 0
        blk_starts = np.nonzero(is_blk)[0]
        leads = lead_arr[nz_v]
        trails = trail_arr[nz_v]
        blk_lead = np.minimum.reduceat(leads, blk_starts)
        blk_trail = np.minimum.reduceat(trails, blk_starts)
        blk_mlen = 64 - blk_lead - blk_trail
        blk_id = np.cumsum(is_blk.astype(np.int64)) - 1
        v_code[nz_v] = np.where(is_blk, 3, 2).astype(np.uint8)
        mfull[nz_v] = blk_mlen[blk_id]
        v_pay[nz_v] = xor[nz_v] >> blk_trail[blk_id].astype(np.uint64)
        hfull[nz_v] = is_blk
        wlead = blk_lead
        wmlen = blk_mlen
    h_seg = _per_seg(hfull.astype(np.int64))
    val_bits_est = (
        64 + 2 * np.maximum(seg_len - 1, 0) + 11 * h_seg + _per_seg(mfull)
    )
    val_raw = val_bits_est >= seg_len * 64 * 0.95
    val_enc = nonempty & ~val_raw

    def _pack_kind(
        enc: np.ndarray,
        cls: np.ndarray,
        pay_w: np.ndarray,
        pay_v: np.ndarray,
        first_words: np.ndarray,
        win: bool,
    ) -> tuple[np.ndarray, np.ndarray, bytes]:
        codes_bytes = np.where(seg_len > 0, (np.maximum(seg_len - 1, 0) + 3) // 4, 0)
        win_bytes = ((11 * h_seg + 7) // 8) if win else np.zeros(S, dtype=np.int64)
        pay_bytes = (_per_seg(pay_w) + 7) // 8
        stream_bytes = np.where(enc, 8 + codes_bytes + win_bytes + pay_bytes, 0)
        byte_base = np.r_[0, np.cumsum(stream_bytes)[:-1]]
        base_bits = byte_base * 8
        total_bytes = int(stream_bytes.sum())

        offs = [base_bits[enc]]
        widths = [np.full(int(enc.sum()), 64, dtype=np.int64)]
        vals = [first_words[enc]]
        penc = enc[seg_of]
        # code section: scatter 2-bit codes into a slot array covering the
        # whole buffer and byte-pack by reshape — one store per code
        # instead of a _pack_fields field per point (the field path costs
        # ~2x encode wall at dense shapes)
        cm = has_code & penc
        slots = np.zeros(total_bytes * 4, dtype=np.uint8)
        slot_idx = (byte_base[seg_of[cm]] + 8) * 4 + (pidx[cm] - 1)
        slots[slot_idx] = cls[cm]
        q = slots.reshape(-1, 4)
        code_bytes = (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]
        # window fields (val stream)
        if win and mv:
            head_before = np.cumsum(hfull.astype(np.int64)) - hfull
            head_ord = head_before - head_before[seg_starts][seg_of]
            hm = hfull & penc
            offs.append(
                base_bits[seg_of[hm]]
                + (8 + codes_bytes[seg_of[hm]]) * 8
                + 11 * head_ord[hm]
            )
            widths.append(np.full(int(hm.sum()), 11, dtype=np.int64))
            hv = (
                (wlead.astype(np.uint64) << np.uint64(6))
                | (wmlen.astype(np.uint64) - np.uint64(1))
            )
            # head values in point order == block order within the batch
            vals.append(hv[np.cumsum(hfull)[hm] - 1])
        # payload fields
        pm = (pay_w > 0) & penc
        pay_off = _within_seg_excl_cumsum(pay_w, seg_starts, seg_of)
        wb_of = win_bytes[seg_of] if win else np.zeros(n_total, dtype=np.int64)
        offs.append(
            base_bits[seg_of[pm]]
            + (8 + codes_bytes[seg_of[pm]] + wb_of[pm]) * 8
            + pay_off[pm]
        )
        widths.append(pay_w[pm])
        vals.append(pay_v[pm])
        buf = np.frombuffer(
            _pack_fields(
                np.concatenate(offs),
                np.concatenate(widths),
                np.concatenate(vals),
                total_bytes * 8,
            ),
            dtype=np.uint8,
        )
        return stream_bytes, byte_base, (buf | code_bytes).tobytes()

    first_idx = np.minimum(seg_starts, max(n_total - 1, 0))
    t_len, t_base, t_buf = _pack_kind(
        ts_enc, t_cls_m, t_w, t_pay,
        np.where(nonempty, tsu[first_idx], 0), win=False,
    )
    v_len, v_base, v_buf = _pack_kind(
        val_enc, v_code, mfull, v_pay,
        np.where(nonempty, bits[first_idx], 0), win=True,
    )

    out: list[bytes] = []
    for s in range(S):
        n_s = int(seg_len[s])
        if n_s == 0:
            out.append(empty_blob)
            continue
        a, b = int(seg_starts[s]), int(seg_ends[s])
        if ts_raw[s]:
            tb = ts_all[a:b].tobytes()
            t_word = _stream_word(len(tb), _RAW_FLAG)
        else:
            tb = t_buf[int(t_base[s]) : int(t_base[s]) + int(t_len[s])]
            t_word = _stream_word(int(t_len[s]), _V2_FLAG)
        if val_raw[s]:
            vb = vals_all[a:b].tobytes()
            v_word = _stream_word(len(vb), _RAW_FLAG)
        else:
            vb = v_buf[int(v_base[s]) : int(v_base[s]) + int(v_len[s])]
            v_word = _stream_word(int(v_len[s]), _V2_FLAG)
        out.append(
            n_s.to_bytes(4, "little")
            + t_word.to_bytes(4, "little")
            + v_word.to_bytes(4, "little")
            + tb
            + vb
        )
    return out


def _decode_ts_v2(data: bytes, ts: np.ndarray, n: int) -> None:
    first = int.from_bytes(data[0:8], "big")
    ts[0] = first - (1 << 64) if first >= 1 << 63 else first
    m = n - 1
    if m == 0:
        return
    cb = (m + 3) // 4
    codes = _unpack_2bit(data[8 : 8 + cb], m).astype(np.int64)
    w = _TS2_W[codes]
    offs = np.cumsum(w) - w + (8 + cb) * 8
    nz = codes > 0
    f = _unpack_fields(data, offs[nz], w[nz])
    c_nz = codes[nz]
    dnz = np.empty(len(f), dtype=np.int64)
    dnz[c_nz == 1] = f[c_nz == 1].astype(np.int64) - 63
    dnz[c_nz == 2] = f[c_nz == 2].astype(np.int64) - 2047
    dnz[c_nz == 3] = f[c_nz == 3].view(np.int64)
    di = np.zeros(m, dtype=np.int64)
    di[nz] = dnz
    with np.errstate(over="ignore"):
        delta = np.cumsum(di.view(np.uint64))
        tsv = np.uint64(first) + np.cumsum(delta)
    ts[1:] = tsv.view(np.int64)


def _decode_val_v2(data: bytes, vals: np.ndarray, n: int) -> None:
    first = int.from_bytes(data[0:8], "big")
    xor = np.zeros(n, dtype=np.uint64)
    xor[0] = first
    m = n - 1
    if m:
        cb = (m + 3) // 4
        codes = _unpack_2bit(data[8 : 8 + cb], m)
        nzc = codes >= 2
        heads = codes == 3
        H = int(heads.sum())
        wb = (11 * H + 7) // 8
        win_base = 8 + cb
        wf = _unpack_fields(
            data,
            np.arange(H, dtype=np.int64) * 11 + win_base * 8,
            np.full(H, 11, dtype=np.int64),
        )
        lead = (wf >> np.uint64(6)) & np.uint64(0x1F)
        mlen = (wf & np.uint64(0x3F)) + np.uint64(1)
        trail = np.uint64(64) - lead - mlen
        widx = np.cumsum(heads.astype(np.int64)) - 1
        wi = widx[nzc]
        widths = mlen[wi].astype(np.int64)
        offs = np.cumsum(widths) - widths + (win_base + wb) * 8
        f = _unpack_fields(data, offs, widths)
        xor[1:][nzc] = f << trail[wi]
    vals[:] = np.bitwise_xor.accumulate(xor).view(np.float64)
