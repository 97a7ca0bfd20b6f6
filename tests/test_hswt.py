"""HSWT construction, serialization (vs streaming emulator), occ queries."""

import numpy as np
import pytest

from gecoz_tpu.index.hswt import HSWT
from gecoz_tpu.index.rankbv import rbv_bytes
from gecoz_tpu.index.shape import HSWTShape
from emulator import emulate_hswt_fill


def make_shape(data):
    return HSWTShape.from_counts(np.bincount(data, minlength=256))


def naive_occ(data, symbol, pos):
    """occ semantics: count in [0..pos] minus one; -1 when none."""
    if pos < 0:
        return -1
    return int(np.sum(data[:pos + 1] == symbol)) - 1


@pytest.mark.parametrize("alphabet,n", [
    (b"AC", 100), (b"ACGT", 1000), (b"ACGTN\0", 5000),
    (b"\0A", 64), (b"A", 17), (b"ACGTNacgtnRYKM\0", 3000),
])
def test_node_bits_match_streaming_fill(alphabet, n, rng):
    syms = np.frombuffer(alphabet, dtype=np.uint8)
    data = rng.choice(syms, size=n)
    shape = make_shape(data)
    tree = HSWT.build(data, shape)
    ref = emulate_hswt_fill(data, shape)
    assert set(ref) == set(tree.nodes)
    for key in shape.nodes:
        assert tree.nodes[key].serialize() == ref[key], key


def test_native_fill_matches_numpy_build(rng, monkeypatch):
    """The C++ one-pass fill (native/hswt_fill.cpp) and the masked-numpy
    fallback must produce identical node bits, incl. skewed counts and
    wide alphabets (deep, unbalanced Huffman shapes)."""
    from gecoz_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    for sigma, n in [(2, 33), (6, 4097), (40, 20000)]:
        syms = rng.choice(256, size=sigma, replace=False).astype(np.uint8)
        p = rng.dirichlet(np.ones(sigma) * 0.15)
        data = rng.choice(syms, size=n, p=p).astype(np.uint8)
        shape = make_shape(data)
        a = HSWT.build(data, shape)
        monkeypatch.setattr(native, "available", lambda: False)
        b = HSWT.build(data, shape)
        monkeypatch.undo()
        assert set(a.nodes) == set(b.nodes)
        for k in a.nodes:
            assert a.nodes[k].length == b.nodes[k].length, (sigma, n, k)
            assert np.array_equal(a.nodes[k].data, b.nodes[k].data), \
                (sigma, n, k)


@pytest.mark.parametrize("alphabet,n", [(b"ACGT", 2000), (b"ACGTN\0x", 3000)])
def test_serialize_read_roundtrip(alphabet, n, rng):
    syms = np.frombuffer(alphabet, dtype=np.uint8)
    data = rng.choice(syms, size=n)
    shape = make_shape(data)
    tree = HSWT.build(data, shape)
    blob = tree.serialize()
    assert len(blob) == shape.size
    back = HSWT.read(np.frombuffer(blob, dtype=np.uint8), n)
    assert np.array_equal(back.decode_bwt(), data)
    assert back.shape.node_lengths == shape.node_lengths


def test_occ_vs_naive(rng):
    syms = np.frombuffer(b"ACGTN\0", dtype=np.uint8)
    data = rng.choice(syms, size=800)
    shape = make_shape(data)
    tree = HSWT.build(data, shape)
    positions = np.array([-1, 0, 1, 5, 400, 799])
    for s in range(256):
        got = tree.occ_batch(s, positions)
        want = np.array([naive_occ(data, s, p) for p in positions])
        assert np.array_equal(got, want), s


def test_getRS(rng):
    syms = np.frombuffer(b"ACGT\0", dtype=np.uint8)
    data = rng.choice(syms, size=300)
    tree = HSWT.build(data, make_shape(data))
    for pos in [0, 1, 17, 299]:
        rank, sym = tree.getRS(pos)
        assert sym == data[pos]
        assert rank == naive_occ(data, sym, pos)
