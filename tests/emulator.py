"""Test oracle: byte-level emulation of the reference's streaming writers.

The production serializers in gecoz_tpu are vectorized and derived from an
*analysis* of the on-disk layout.  To guard against analysis mistakes, this
module re-creates the reference's stateful 64-bit streaming mechanics
step-for-step (AbstractBitStream.writeBits/flush, RankedWTNode.putLong's
interleaved counter emission computed by reading back the partially written
buffer, HuffmanShapedWaveletTree.fill's per-symbol bit pushes, and
IndexWaveletTree's in-place bucket scatter).  Agreement between the two
independent implementations on random inputs is the bit-exactness evidence
we can get without running the reference jar (no JVM in this image).

Slow by design; test-only.
"""

from __future__ import annotations

import struct

MASK64 = (1 << 64) - 1


class StreamRBV:
    """Emulates RankedWTNode streaming writes (RankedWTNode.java:36-246)."""

    def __init__(self, size_bits: int):
        from gecoz_tpu.index.rankbv import rbv_bytes
        self.size = size_bits
        self.buf = bytearray(rbv_bytes(size_bits))
        self.pos = 0              # byte position
        self.value = 0            # pending bits (LSB first)
        self.bits_left = 0        # 64 - pending bit count... Java semantics:
        # Java bits_left = free bits remaining in `value` (0 = empty/full?)
        # Java: writeBits with bits_left==0 means value empty.

    # -- AbstractBitStream.writeBits (LSB-first 64-bit accumulation) -------
    def write_bits(self, bits: int, nbits: int) -> None:
        bits &= (1 << nbits) - 1 if nbits < 64 else MASK64
        bl = self.bits_left
        if bl > nbits:
            self.value |= (bits << (64 - bl)) & MASK64
            self.bits_left = bl - nbits
        elif bl == 0:
            self.value = bits
            self.bits_left = 64 - nbits
        elif bl < nbits:
            self._put_long((self.value | (bits << (64 - bl))) & MASK64)
            self.value = bits >> bl
            self.bits_left = bl + 64 - nbits
        else:  # bl == nbits
            self._put_long((self.value | (bits << (64 - bl))) & MASK64)
            self.bits_left = 0

    def put(self, bit: int) -> None:
        self.write_bits(bit, 1)

    def flush(self) -> None:
        # AbstractBitStream.flush:150-158; note this dispatches to the
        # counter-inserting putLong (virtual call in Java).  The reference
        # then rewinds position to pos+len, which is only observable through
        # subsequent writes — none happen after flush.
        if self.bits_left > 0:
            self._put_long(self.value)
            self.bits_left = 0

    # -- RankedWTNode.putLong: interleaved counters ------------------------
    def _put_long(self, value: int) -> None:
        pos = self.pos
        nlong = pos - (pos // 8454) * 6
        nlong -= (nlong // 66) << 1
        if (nlong & 0x1FFF) == 0 and nlong > 0:
            self._write_raw(struct.pack("<Q", self._count((nlong << 3) - 1)))
        elif (nlong & 0b111111) == 0 and nlong > 0:
            if (nlong & 0x1FFF) > 64:
                count = struct.unpack_from("<H", self.buf, self.pos - 66)[0]
            else:
                count = 0
            for i in range(self.pos - 64, self.pos, 8):
                count += bin(struct.unpack_from("<Q", self.buf, i)[0]).count("1")
            self._write_raw(struct.pack("<H", count))
        self._put_long_raw(value)

    def _put_long_raw(self, value: int) -> None:
        remaining = len(self.buf) - self.pos
        if remaining < 8:
            # partial write: ceil bytes of the pending value
            n = 64 - self.bits_left
            i = 0
            while self.pos < len(self.buf) and i <= n:
                self.buf[self.pos] = (value >> i) & 0xFF
                self.pos += 1
                i += 8
        else:
            struct.pack_into("<Q", self.buf, self.pos, value)
            self.pos += 8

    def _write_raw(self, data: bytes) -> None:
        self.buf[self.pos:self.pos + len(data)] = data
        self.pos += len(data)

    # -- RankedWTNode.count, reading back the interleaved buffer -----------
    def _count(self, idx: int) -> int:
        count = 0
        nlidx = idx >> 16
        nsidx = (idx >> 9) & 0b1111111
        spos = nsidx * 66
        lpos = 0
        if nlidx > 0:
            lpos = nlidx * 8454
            count = struct.unpack_from("<Q", self.buf, lpos - 8)[0]
        bpos = lpos + spos
        if nsidx > 0:
            count += struct.unpack_from("<H", self.buf, bpos - 2)[0]
        end = bpos + ((idx >> 3) & 0b111000)
        while bpos < end:
            count += bin(self._get_long_raw(bpos)).count("1")
            bpos += 8
        last = (self._get_long_raw(bpos) << (63 - (idx & 63))) & MASK64
        return count + bin(last).count("1")

    def _get_long_raw(self, index: int) -> int:
        # count() reads via super.getLong(index) — no counter skipping
        # (RankedWTNode.java:117-121 call super.getLong explicitly)
        if len(self.buf) - index < 8:
            out = 0
            for i, b in enumerate(self.buf[index:]):
                out |= b << (8 * i)
            return out
        return struct.unpack_from("<Q", self.buf, index)[0]

    def getvalue(self) -> bytes:
        return bytes(self.buf)


def emulate_rbv(bits) -> bytes:
    """Stream a 0/1 sequence through the emulated writer."""
    w = StreamRBV(len(bits))
    for b in bits:
        w.put(int(b))
    w.flush()
    return w.getvalue()


def emulate_hswt_fill(bwt, shape) -> dict:
    """Per-symbol streaming fill (HuffmanShapedWaveletTree.fill:127-146),
    keyed by (level, prefix)."""
    writers = {k: StreamRBV(shape.node_lengths[k]) for k in shape.nodes}
    codes = shape.codes
    lens = shape.bit_lengths
    for sym in bwt:
        code = int(codes[sym])
        for j in range(int(lens[sym])):
            key = (j, code & ((1 << j) - 1))
            writers[key].put((code >> j) & 1)
    for w in writers.values():
        w.flush()
    return {k: w.getvalue() for k, w in writers.items()}


def emulate_iwt(sa) -> bytes:
    """IndexWaveletTree.java:83-112 in-place scatter construction."""
    sa = [int(x) for x in sa]
    n = len(sa)
    _ssa = [0] * n
    hibit = n.bit_length()
    out = []
    while hibit > 0:
        hibit -= 1
        node = StreamRBV(n)
        mask = (~0) << hibit
        for i in range(n):
            idx = sa[i]
            block = idx & mask
            c = min(block + (1 << hibit), n) - 1
            ptr = _ssa[c]
            if ptr >= 0:
                _ssa[c] = ~block
                _ssa[block] = idx
            else:
                ptr -= 1
                _ssa[c] = ptr
                _ssa[~ptr] = idx
            node.put((idx >> hibit) & 1)
        node.flush()
        out.append(node.getvalue())
        sa, _ssa = _ssa, sa
    return b"".join(out)
