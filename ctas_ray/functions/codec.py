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
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = bits
        while remaining:
            byte_i, bit_i = divmod(pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            remaining -= take
        self.pos = pos
        return out


_TS_RANGES = (
    (7, 63),  # '10'
    (9, 255),  # '110'
    (12, 2047),  # '1110'
)


def encode_series(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 microsecond, float64) arrays into one blob.

    Layout: [uint32 count][timestamp bitstream][value bitstream], each
    bitstream byte-aligned and length-prefixed with uint32 byte counts.
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    tw = _BitWriter()
    vw = _BitWriter()
    if n:
        tw.write(int(ts[0]) & _MASK64, 64)
        # all timestamp arithmetic is mod 2^64: deltas of extreme int64
        # values need 65 bits, but mod-2^64 residues round-trip exactly
        prev_ts = int(ts[0]) & _MASK64
        prev_delta = 0
        for i in range(1, n):
            t = int(ts[i]) & _MASK64
            delta = (t - prev_ts) & _MASK64
            dod = (delta - prev_delta) & _MASK64
            if dod >= 1 << 63:
                dod -= 1 << 64
            if dod == 0:
                tw.write(0, 1)
            else:
                for idx, (bits, off) in enumerate(_TS_RANGES):
                    if -off <= dod <= off + 1:
                        tw.write((1 << (idx + 2)) - 2, idx + 2)  # '10','110','1110'
                        tw.write(dod + off, bits)
                        break
                else:
                    tw.write(0b1111, 4)
                    tw.write(dod & _MASK64, 64)
            prev_ts = t
            prev_delta = delta

        bits_arr = vals.view(np.uint64)
        prev_bits = int(bits_arr[0])
        vw.write(prev_bits, 64)
        prev_lead, prev_mlen = 65, 0  # 65 = "no previous window"
        for i in range(1, n):
            b = int(bits_arr[i])
            x = b ^ prev_bits
            if x == 0:
                vw.write(0, 1)
            else:
                lead = 64 - x.bit_length()
                trail = (x & -x).bit_length() - 1
                if lead > 31:
                    lead = 31  # 5-bit field cap (as in the paper)
                mlen = 64 - lead - trail
                if (
                    prev_lead <= lead
                    and (64 - prev_lead - prev_mlen) <= trail
                    and prev_mlen > 0
                ):
                    # reuse previous window
                    vw.write(0b10, 2)
                    prev_trail = 64 - prev_lead - prev_mlen
                    vw.write(x >> prev_trail, prev_mlen)
                else:
                    vw.write(0b11, 2)
                    vw.write(lead, 5)
                    vw.write(mlen - 1, 6)
                    vw.write(x >> trail, mlen)
                    prev_lead, prev_mlen = lead, mlen
            prev_bits = b
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
    tlen = int.from_bytes(blob[4:8], "little")
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    tr = _BitReader(blob[12 : 12 + tlen])
    first = tr.read(64)
    ts[0] = first - (1 << 64) if first >= 1 << 63 else first
    prev_ts, prev_delta = first, 0  # mod-2^64 residues
    for i in range(1, n):
        if tr.read(1) == 0:
            dod = 0
        else:
            idx = 0
            while idx < 3 and tr.read(1) == 1:
                idx += 1
            if idx < 3:
                bits, off = _TS_RANGES[idx]
                dod = tr.read(bits) - off
            else:
                dod = tr.read(64)
        prev_delta = (prev_delta + dod) & _MASK64
        prev_ts = (prev_ts + prev_delta) & _MASK64
        ts[i] = prev_ts - (1 << 64) if prev_ts >= 1 << 63 else prev_ts
    vr = _BitReader(blob[12 + tlen :])
    bits_out = np.empty(n, dtype=np.uint64)
    prev_bits = vr.read(64)
    bits_out[0] = prev_bits
    lead, mlen = 0, 0
    for i in range(1, n):
        if vr.read(1) == 0:
            bits_out[i] = prev_bits
            continue
        if vr.read(1) == 0:  # reuse window
            trail = 64 - lead - mlen
            x = vr.read(mlen) << trail
        else:
            lead = vr.read(5)
            mlen = vr.read(6) + 1
            trail = 64 - lead - mlen
            x = vr.read(mlen) << trail
        prev_bits ^= x
        bits_out[i] = prev_bits
    vals[:] = bits_out.view(np.float64)
    return ts, vals
