"""Suffix-array backends vs the sorted-suffix oracle."""

import numpy as np
import pytest

from gecoz_tpu.ops.sa import (bwt_from_sa, suffix_array, suffix_array_naive,
                              suffix_array_numpy)


@pytest.mark.parametrize("case", [
    b"banana\0", b"mississippi\0", b"AC\0G\0", b"B\0A\0",
    b"\0\0\0", b"aaaaaaaa\0", b"A",
])
def test_doubling_vs_naive_fixed(case):
    s = np.frombuffer(case, dtype=np.uint8)
    assert np.array_equal(suffix_array_numpy(s), suffix_array_naive(s))


def test_doubling_vs_naive_random(rng):
    for _ in range(20):
        n = int(rng.integers(2, 400))
        # small alphabets with embedded zeros — the adversarial case
        s = rng.choice(np.frombuffer(b"AB\0", np.uint8), size=n)
        assert np.array_equal(suffix_array_numpy(s), suffix_array_naive(s))


def test_bwt_gather():
    s = np.frombuffer(b"banana\0", dtype=np.uint8)
    sa = suffix_array_numpy(s)
    bwt = bwt_from_sa(s, sa)
    # row 0 is "\0..." whose predecessor is 'a'
    assert bytes(bwt).count(b"a") == 3
    assert len(bwt) == len(s)


def test_dispatch_auto(rng):
    s = rng.choice(np.frombuffer(b"ACGT\0", np.uint8), size=500)
    assert np.array_equal(suffix_array(s, "auto"), suffix_array_naive(s))
