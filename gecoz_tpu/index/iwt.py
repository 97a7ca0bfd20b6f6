"""Index wavelet tree over a permutation (sampled-SA storage).

Byte-compatible with IndexWaveletTree (nova-algo tree/
IndexWaveletTree.java:41-176): ``ceil(log2(n))+1`` ranked bit vectors of
length n, serialized top level first.  Level ``l``'s bit sequence is the
permutation values stable-sorted by their bits above ``l``, emitting bit
``l`` of each value — the reference reaches the same order through an
in-place bucket scatter (IndexWaveletTree.java:83-112); here it is two
numpy argsorts per level.

In memory we keep the plain permutation and its inverse: O(1) get/find
instead of the reference's O(log n) bit-vector walks.  Only the serialized
bytes match the reference.
"""

from __future__ import annotations

import numpy as np

from gecoz_tpu.index.rankbv import (RankBitVector, deserialize_rbv, pack_bits,
                                    rbv_bytes, serialize_rbv)


def iwt_levels(n: int) -> int:
    """Number of bit-vector levels for an index of size n
    (64 - numberOfLeadingZeros(n))."""
    return int(n).bit_length()


def iwt_size(n: int) -> int:
    """Serialized size in bytes (IndexWaveletTree.size)."""
    return rbv_bytes(n) * iwt_levels(n)


def serialize_iwt(perm: np.ndarray) -> bytes:
    """Serialize a permutation of 0..n-1 in the reference layout."""
    perm = np.asarray(perm, dtype=np.int64)
    n = len(perm)
    out = []
    values = perm
    for lvl in range(iwt_levels(n) - 1, -1, -1):
        bits = (values >> lvl) & 1
        out.append(serialize_rbv(pack_bits(bits), n))
        if lvl > 0:
            # stable sort by bits above the *next* level == bits >= lvl
            order = np.argsort(values >> lvl, kind="stable")
            values = values[order]
    return b"".join(out)


def deserialize_iwt(buf: np.ndarray, n: int) -> np.ndarray:
    """Reconstruct the plain permutation from serialized level planes."""
    buf = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    nlv = iwt_levels(n)
    nb = rbv_bytes(n)
    planes = []
    for i in range(nlv):
        data = deserialize_rbv(buf[i * nb:(i + 1) * nb], n)
        planes.append(np.unpackbits(data, count=n, bitorder="little").astype(np.int64))

    # planes[0] is the top level (original order); walk down re-deriving the
    # stable permutation the writer applied
    pos_orig = np.arange(n, dtype=np.int64)   # level order -> original index
    acc = planes[0].copy()                    # value >> lvl, in level order
    for i in range(1, nlv):
        order = np.argsort(acc, kind="stable")
        pos_orig = pos_orig[order]
        acc = acc[order] * 2 + planes[i]
    perm = np.zeros(n, dtype=np.int64)
    perm[pos_orig] = acc
    return perm


class IndexWaveletTree:
    """Plain-permutation view with reference-compatible serialization."""

    def __init__(self, perm: np.ndarray):
        self.perm = np.asarray(perm, dtype=np.int64)
        self.inv = np.zeros(len(self.perm), dtype=np.int64)
        self.inv[self.perm] = np.arange(len(self.perm), dtype=np.int64)

    def get(self, pos):
        """Value at position `pos` of the original array."""
        return self.perm[pos]

    def find(self, value):
        """Position of `value` in the original array."""
        return self.inv[value]

    def serialize(self) -> bytes:
        return serialize_iwt(self.perm)

    @classmethod
    def deserialize(cls, buf, n: int) -> "IndexWaveletTree":
        return cls(deserialize_iwt(buf, n))
