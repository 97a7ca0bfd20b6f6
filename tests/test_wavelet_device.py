"""Device wavelet construction + device-backend block encode vs host."""

import numpy as np
import pytest

pytest.importorskip("jax")

from gecoz_tpu.formats.gcz import encode_block
from gecoz_tpu.index.hswt import HSWT
from gecoz_tpu.index.shape import HSWTShape
from gecoz_tpu.ops.wavelet import build_hswt_device
from conftest import random_block


def test_device_wavelet_matches_host(rng):
    data, _ = random_block(rng, nseq=3, minlen=50, maxlen=500,
                           alphabet=b"ACGTN")
    shape = HSWTShape.from_counts(np.bincount(data, minlength=256))
    host = HSWT.build(data, shape)      # treat data as a BWT directly
    dev = build_hswt_device(data, shape)
    for key in shape.nodes:
        assert np.array_equal(dev[key], host.nodes[key].data), key


def test_device_encode_block_bitexact(rng):
    data, _ = random_block(rng, nseq=2, minlen=100, maxlen=800)
    gcz_h, gcx_h = encode_block(data, ["a", "b"], backend="numpy")
    gcz_d, gcx_d = encode_block(data, ["a", "b"], backend="device")
    assert gcz_h == gcz_d
    assert gcx_h == gcx_d
