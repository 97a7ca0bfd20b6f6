"""Huffman + deflate code tables and the RFC1951 3.2.7 lengths table."""

import numpy as np
import pytest

from gecoz_tpu.huffman.core import huffman_bit_lengths
from gecoz_tpu.huffman.deflate_tables import (
    DeflateCodeTable, canonical_codes, lengths_table_bit_length,
    read_lengths_table, restrict_lengths, write_lengths_table)
from gecoz_tpu.utils.bits import BitReader, BitWriter


def entropy_cost(counts, lengths):
    return int(np.sum(np.asarray(counts) * np.asarray(lengths)))


def test_huffman_optimality_small(rng):
    """Kraft equality + optimal total cost vs a heap-based Huffman."""
    import heapq
    for _ in range(50):
        k = int(rng.integers(2, 12))
        counts = np.zeros(256, dtype=np.int64)
        syms = rng.choice(256, size=k, replace=False)
        counts[syms] = rng.integers(1, 1000, size=k)
        bl = huffman_bit_lengths(counts)
        assert (bl[counts == 0] == 0).all()
        # Kraft sum == 1 for >1 symbols
        assert sum(2.0 ** -l for l in bl[bl > 0]) == pytest.approx(1.0)
        # optimal cost
        heap = [(int(c), i) for i, c in enumerate(counts) if c > 0]
        heapq.heapify(heap)
        cost = 0
        while len(heap) > 1:
            a = heapq.heappop(heap)[0]
            b = heapq.heappop(heap)[0]
            cost += a + b
            heapq.heappush(heap, (a + b, -1))
        assert entropy_cost(counts, bl) == cost


def test_huffman_single_symbol():
    counts = np.zeros(256, dtype=np.int64)
    counts[65] = 10
    bl = huffman_bit_lengths(counts)
    assert bl[65] == 1 and bl.sum() == 1


def test_canonical_codes_prefix_free(rng):
    for _ in range(30):
        k = int(rng.integers(2, 40))
        counts = np.zeros(256, dtype=np.int64)
        syms = rng.choice(256, size=k, replace=False)
        counts[syms] = rng.integers(1, 10000, size=k)
        table = DeflateCodeTable.from_counts(counts)
        lens = table.bit_lengths
        codes = table.codes
        live = np.flatnonzero(lens > 0)
        # prefix-freeness in LSB-first space
        for i in live:
            for j in live:
                if i == j:
                    continue
                li, lj = int(lens[i]), int(lens[j])
                if li <= lj:
                    assert (codes[j] & ((1 << li) - 1)) != codes[i]


def test_restrict_lengths_clamps(rng):
    # fibonacci-ish counts force deep codes
    counts = np.zeros(256, dtype=np.int64)
    fib = [1, 1]
    for _ in range(28):
        fib.append(fib[-1] + fib[-2])
    counts[:30] = fib
    bl = huffman_bit_lengths(counts)
    assert bl.max() > 15
    bl7 = restrict_lengths(bl, counts, 15)
    assert bl7.max() <= 15
    assert sum(2.0 ** -l for l in bl7[bl7 > 0]) <= 1.0 + 1e-12
    assert (bl7[counts > 0] > 0).all()


@pytest.mark.parametrize("k", [1, 2, 5, 6, 17, 60, 256])
def test_lengths_table_roundtrip(k, rng):
    counts = np.zeros(256, dtype=np.int64)
    syms = rng.choice(256, size=k, replace=False)
    counts[syms] = rng.integers(1, 5000, size=k)
    table = DeflateCodeTable.from_counts(counts)
    w = BitWriter()
    write_lengths_table(table.bit_lengths, w)
    nbits = lengths_table_bit_length(table.bit_lengths)
    assert w.bit_length == nbits
    data = w.getvalue()
    back = read_lengths_table(BitReader(data), 256)
    assert np.array_equal(back, table.bit_lengths)


def test_decode_first_matches_codes(rng):
    counts = np.zeros(256, dtype=np.int64)
    counts[rng.choice(256, size=9, replace=False)] = rng.integers(1, 100, size=9)
    t = DeflateCodeTable.from_counts(counts)
    for s in np.flatnonzero(t.bit_lengths > 0):
        assert t.decode_first(int(t.codes[s])) == s
