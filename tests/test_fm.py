"""FM-index semantics: round-trip decode, count/search/locate vs brute force.

Includes the adversarial multi-sequence orderings where the reference's
uncorrected separator LF-step would break (see gecoz_tpu/index/fm.py doc).
"""

import numpy as np
import pytest

from gecoz_tpu.formats.gcz import encode_block
from gecoz_tpu.index.fm import FMIndex
from gecoz_tpu.index.hswt import HSWT
from gecoz_tpu.index.shape import HSWTShape
from gecoz_tpu.index.ssa import SampledSAIndex
from gecoz_tpu.ops.sa import bwt_from_sa, suffix_array_numpy
from conftest import random_block


def build_fm(data, rate=32):
    data = np.asarray(data, dtype=np.uint8)
    sa = suffix_array_numpy(data)
    bwt = bwt_from_sa(data, sa)
    shape = HSWTShape.from_counts(np.bincount(data, minlength=256))
    return FMIndex(HSWT.build(bwt, shape), SampledSAIndex.build(sa, rate))


def brute_find(seqs, pattern):
    out = {}
    for i, s in enumerate(seqs):
        hay = bytes(s)
        hits = []
        start = 0
        while True:
            p = hay.find(pattern, start)
            if p < 0:
                break
            hits.append(p)
            start = p + 1
        if hits:
            out[i] = np.array(hits, dtype=np.int64)
    return out


@pytest.mark.parametrize("case", [
    b"B\0A\0",                 # wrap row not minimal: reference LF breaks
    b"banana\0",
    b"CGT\0AAA\0TTT\0",
    b"ZZZ\0AAA\0",
])
def test_decode_text_fixed(case):
    data = np.frombuffer(case, dtype=np.uint8)
    fm = build_fm(data, rate=4)
    assert bytes(fm.decode_text()) == case


@pytest.mark.parametrize("rate", [4, 16, 32])
def test_decode_text_random(rate, rng):
    for _ in range(10):
        data, seqs = random_block(rng, nseq=int(rng.integers(1, 6)))
        fm = build_fm(data, rate)
        assert bytes(fm.decode_text()) == bytes(data)


def test_sequence_bounds(rng):
    data, seqs = random_block(rng, nseq=4)
    fm = build_fm(data)
    assert fm.nseq == 4
    for i, s in enumerate(seqs):
        assert fm.seq_length(i) == len(s)
        assert fm.extract(i) == bytes(s)
        if len(s) > 10:
            assert fm.extract(i, 3, 9) == bytes(s[3:9])


def test_find_vs_brute(rng):
    data, seqs = random_block(rng, nseq=3, minlen=50, maxlen=300,
                              alphabet=b"ACGT")
    fm = build_fm(data, rate=8)
    for plen in [1, 2, 3, 5, 8]:
        for _ in range(10):
            pat = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                   size=plen))
            want = brute_find(seqs, pat)
            got = fm.find(pat)
            assert set(got) == set(want)
            for k in want:
                assert np.array_equal(np.sort(got[k]), want[k]), (pat, k)


def test_find_absent_symbol(rng):
    data, _ = random_block(rng, nseq=2, alphabet=b"ACGT")
    fm = build_fm(data)
    assert fm.find(b"X") == {}
    assert fm.count_total(b"ZQ") == 0


def test_locate_all_rows(rng):
    data, _ = random_block(rng, nseq=3, minlen=20, maxlen=60)
    fm = build_fm(data, rate=8)
    sa = suffix_array_numpy(data)
    got = fm.locate(np.arange(len(data), dtype=np.int64))
    assert np.array_equal(got, sa)


def test_decode_range_matches_full(rng):
    data, seqs = random_block(rng, nseq=3, minlen=40, maxlen=300)
    for rate in (4, 32):
        fm = build_fm(data, rate)
        full = fm.decode_text()
        n = len(data)
        for lo, hi in [(0, n), (5, 6), (0, 1), (n - 1, n), (17, 93),
                       (n // 2, n), (n - rate, n)]:
            got = fm.decode_range(lo, hi)
            assert np.array_equal(got, full[lo:hi]), (rate, lo, hi)
