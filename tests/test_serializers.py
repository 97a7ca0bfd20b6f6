"""Vectorized serializers vs the streaming emulator (bit-exactness layer 0)."""

import numpy as np
import pytest

from gecoz_tpu.index.rankbv import (RankBitVector, deserialize_rbv, pack_bits,
                                    rbv_bytes, serialize_rbv)
from gecoz_tpu.index.iwt import IndexWaveletTree, deserialize_iwt, iwt_size
from emulator import emulate_iwt, emulate_rbv

LENGTHS = [1, 7, 8, 63, 64, 65, 511, 512, 513, 1000, 4095, 4096,
           65535, 65536, 65537, 70000, 200000]


@pytest.mark.parametrize("n", LENGTHS)
def test_rbv_serialize_matches_streaming_emulator(n, rng):
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    mine = serialize_rbv(pack_bits(bits), n)
    ref = emulate_rbv(bits)
    assert len(mine) == rbv_bytes(n)
    assert mine == ref


@pytest.mark.parametrize("n", LENGTHS)
def test_rbv_roundtrip(n, rng):
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    data = pack_bits(bits)
    buf = np.frombuffer(serialize_rbv(data, n), dtype=np.uint8)
    back = deserialize_rbv(buf, n)
    assert np.array_equal(back, data)


@pytest.mark.parametrize("n", [1, 64, 513, 5000, 66000])
def test_rbv_rank_select(n, rng):
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    bv = RankBitVector.from_bits(bits)
    cum = np.cumsum(bits)
    idx = rng.integers(0, n, size=min(n, 200))
    assert np.array_equal(bv.rank1_inclusive(idx), cum[idx])
    assert np.array_equal(np.asarray(bv.get(idx)), bits[idx])
    ones = np.flatnonzero(bits)
    for k in [1, len(ones) // 2, len(ones)]:
        if k >= 1 and len(ones):
            assert bv.select1(np.array([k]))[0] == ones[k - 1]
    assert bv.select1(np.array([len(ones) + 1]))[0] == -1


def test_select1_superblock_guided_large(rng):
    """select1 at >=100M bits (sparse), vs the known one positions —
    exercises the superblock + word search across 64Kbit segments
    (RankedWTNode.findOne:145-194 scale)."""
    from gecoz_tpu.index.rankbv import RankBitVector
    length = 100_000_019
    ones = np.unique(rng.integers(0, length, size=30_000))
    packed = np.zeros((length + 7) >> 3, dtype=np.uint8)
    np.bitwise_or.at(packed, ones >> 3, (1 << (ones & 7)).astype(np.uint8))
    bv = RankBitVector(packed, length)
    qs = np.unique(rng.integers(1, len(ones) + 1, size=512))
    assert np.array_equal(bv.select1(qs), ones[qs - 1])
    assert bv.select1(1) == ones[0]
    assert bv.select1(len(ones)) == ones[-1]
    assert bv.select1(len(ones) + 1) == -1
    assert np.array_equal(bv.rank1_inclusive(ones[qs - 1]), qs)


@pytest.mark.parametrize("n", [1, 511, 513, 65537, 70000])
def test_rbv_native_and_numpy_paths_agree(n, rng, monkeypatch):
    """The C++ interleaver and the pure-numpy fallback are independent
    implementations; both must produce the reference layout."""
    from gecoz_tpu import native
    import gecoz_tpu.index.rankbv as rankbv
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    data = pack_bits(bits)
    via_auto = serialize_rbv(data, n)

    monkeypatch.setattr(native, "available", lambda: False)
    via_numpy = serialize_rbv(data, n)
    assert via_auto == via_numpy
    back = deserialize_rbv(np.frombuffer(via_numpy, np.uint8), n)
    assert np.array_equal(back, data)


@pytest.mark.parametrize("n", [1, 2, 3, 63, 64, 65, 513, 1000, 5000])
def test_iwt_serialize_matches_java_scatter(n, rng):
    perm = rng.permutation(n).astype(np.int64)
    mine = IndexWaveletTree(perm).serialize()
    ref = emulate_iwt(perm)
    assert len(mine) == iwt_size(n)
    assert mine == ref


@pytest.mark.parametrize("n", [1, 5, 64, 513, 5000])
def test_iwt_roundtrip(n, rng):
    perm = rng.permutation(n).astype(np.int64)
    buf = np.frombuffer(IndexWaveletTree(perm).serialize(), dtype=np.uint8)
    back = deserialize_iwt(buf, n)
    assert np.array_equal(back, perm)
