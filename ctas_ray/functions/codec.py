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
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_series", "decode_series", "encode_text_block", "decode_text_block"]

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


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, bits: int) -> None:
        acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        nbits = self.nbits + bits
        nbytes = nbits >> 3
        if nbytes:
            rem = nbits & 7
            self.out += (acc >> rem).to_bytes(nbytes, "big")
            acc &= (1 << rem) - 1
            nbits = rem
        self.acc = acc
        self.nbits = nbits

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


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


_TS_RANGES = (
    (7, 63),  # '10'
    (9, 255),  # '110'
    (12, 2047),  # '1110'
)

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
    return dod, xor, lead_arr, trail_arr, ts_bits + val_bits


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x == 0 -> 64)."""
    lead = np.full(x.shape, 64, dtype=np.int64)
    y = x.copy()
    pos = np.zeros(x.shape, dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        t = y >> np.uint64(s)
        cond = t != 0
        y = np.where(cond, t, y)
        pos += np.where(cond, np.uint64(s), np.uint64(0))
    nz = x != 0
    lead[nz] = 63 - pos[nz].astype(np.int64)
    return lead


def encode_series(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 microsecond, float64) arrays into one blob.

    Layout: [uint32 count][timestamp bitstream][value bitstream], each
    bitstream byte-aligned and length-prefixed with uint32 byte counts.

    The per-point analysis (XOR, leading/trailing zeros, delta-of-delta
    bucketing) is vectorized in numpy; the remaining Python loop only
    merges each point's control+payload bits into ONE bit-write.
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    if n:
        dod, xor, lead_arr, trail_arr, est_bits = _analyze(ts, vals)
        if est_bits >= n * 128 * 0.95:
            # incompressible series (near-random payloads): store RAW at
            # memcpy speed instead of paying the bit-packing loop for a
            # <5% size win (real TSDBs do the same; decode stays exact)
            return (
                n.to_bytes(4, "little")
                + _RAW_MARKER
                + ts.tobytes()
                + vals.tobytes()
            )
    tw = _BitWriter()
    vw = _BitWriter()
    if n:
        tw.write(int(ts[0]) & _MASK64, 64)
        # runs of dod==0 are single '0'-bit emissions: write each run in
        # ONE call (bitstream identical; loop touches only nonzero points)
        nz_t = np.nonzero(dod[1:])[0] + 1
        prev_end = 1
        for i in nz_t.tolist():
            if i > prev_end:
                tw.write(0, i - prev_end)
            d = int(dod[i])
            if -63 <= d <= 64:
                tw.write((0b10 << 7) | (d + 63), 9)
            elif -255 <= d <= 256:
                tw.write((0b110 << 9) | (d + 255), 12)
            elif -2047 <= d <= 2048:
                tw.write((0b1110 << 12) | (d + 2047), 16)
            else:
                tw.write((0b1111 << 64) | (d & _MASK64), 68)
            prev_end = i + 1
        if n > prev_end:
            tw.write(0, n - prev_end)

        vw.write(int(vals.view(np.uint64)[0]), 64)
        prev_lead, prev_mlen = 65, 0  # 65 = "no previous window"
        nz_v = np.nonzero(xor[1:])[0] + 1
        prev_end = 1
        for i in nz_v.tolist():
            if i > prev_end:
                vw.write(0, i - prev_end)  # run of identical values
            x = int(xor[i])
            lead = int(lead_arr[i])
            trail = int(trail_arr[i])
            mlen = 64 - lead - trail
            if (
                prev_lead <= lead
                and (64 - prev_lead - prev_mlen) <= trail
                and prev_mlen > 0
            ):
                prev_trail = 64 - prev_lead - prev_mlen
                vw.write((0b10 << prev_mlen) | (x >> prev_trail), prev_mlen + 2)
            else:
                vw.write(
                    (((0b11 << 5 | lead) << 6 | (mlen - 1)) << mlen) | (x >> trail),
                    13 + mlen,
                )
                prev_lead, prev_mlen = lead, mlen
            prev_end = i + 1
        if n > prev_end:
            vw.write(0, n - prev_end)
    tb = tw.finish()
    vb = vw.finish()
    head = (
        n.to_bytes(4, "little")
        + len(tb).to_bytes(4, "little")
        + len(vb).to_bytes(4, "little")
    )
    return head + tb + vb


def decode_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_series`; exact round-trip."""
    n = int.from_bytes(blob[0:4], "little")
    if blob[4:12] == _RAW_MARKER:
        ts = np.frombuffer(blob[12 : 12 + 8 * n], dtype=np.int64).copy()
        vals = np.frombuffer(blob[12 + 8 * n :], dtype=np.float64).copy()
        return ts, vals
    tlen = int.from_bytes(blob[4:8], "little")
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    tr = _BitReader(blob[12 : 12 + tlen])
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
    vr = _BitReader(blob[12 + tlen :])
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
    return ts, vals
