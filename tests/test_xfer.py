"""Packed host<->device transfer round trips (utils/xfer.py)."""

import numpy as np
import pytest

from gecoz_tpu.utils import xfer


def _mk(rng, n, alphabet=b"ACGTN\0"):
    syms = np.frombuffer(bytes(alphabet), np.uint8)
    p = np.array([0.3, 0.2, 0.2, 0.28, 0.015, 0.005])[: len(syms)]
    p = p / p.sum()
    return rng.choice(syms, size=n, p=p).astype(np.uint8)


def _unpack(data, pad_to=None):
    import jax.numpy as jnp
    packed, base, runs, ep, ev, total = xfer.pack_block(data, pad_to=pad_to)
    return np.asarray(xfer.unpack_device(
        jnp.asarray(packed), tuple(int(b) for b in base),
        jnp.asarray(runs), jnp.asarray(ep), jnp.asarray(ev), total))


@pytest.mark.parametrize("n", [1, 3, 4, 1023, 4096, 100_001])
def test_pack_unpack_host_device(rng, n):
    data = _mk(rng, n)
    assert np.array_equal(_unpack(data), data)


def test_pack_with_virtual_padding(rng):
    data = _mk(rng, 10_007)
    out = _unpack(data, pad_to=16_384)
    assert len(out) == 16_384
    assert np.array_equal(out[:10_007], data)
    assert not out[10_007:].any()


def test_pack_megarun_is_runs_not_points(rng):
    """Megabase-style N runs must land in the run list, not the point
    list (the wire-cost reason this encoding exists)."""
    data = _mk(rng, 200_000, alphabet=b"ACGT")
    data[50_000:90_000] = ord("N")
    data[120_000:120_010] = 0          # short run -> points
    packed, base, runs, ep, ev, total = xfer.pack_block(data)
    real_runs = [(int(s), int(e), int(v)) for s, e, v in runs if s != e]
    assert (50_000, 90_000, ord("N")) in real_runs
    assert len(ep) <= 1024             # the 10 zeros + bucket padding
    assert xfer.wire_bytes(total, len(runs), len(ep)) < total // 3
    assert np.array_equal(_unpack(data), data)


def test_pack_small_alphabet_no_exceptions(rng):
    data = _mk(rng, 5000, alphabet=b"ACGT")
    packed, base, runs, ep, ev, n = xfer.pack_block(data)
    assert len(ep) == 0 and len(runs) == 0
    assert xfer.wire_bytes(n, len(runs), len(ep)) < n // 3


def test_put_packed_matches_plain(rng):
    data = _mk(rng, 2 << 20)
    got = np.asarray(xfer.put_packed(data))
    assert np.array_equal(got, data)
    small = _mk(rng, 100)
    assert np.array_equal(np.asarray(xfer.put_packed(small)), small)
    padded = np.asarray(xfer.put_packed(data, pad_to=(2 << 20) + 77))
    assert np.array_equal(padded[: 2 << 20], data)
    assert not padded[2 << 20:].any()


def test_should_pack_gate():
    dna = np.zeros(256, np.int64)
    for b, c in zip(b"ACGTN", (30, 20, 20, 28, 2)):
        dna[b] = c * 100
    assert xfer.should_pack(dna)
    flat = np.full(256, 100, np.int64)     # binary-ish payload
    assert not xfer.should_pack(flat)


def test_nibble_fetch_roundtrip(rng):
    import jax
    import jax.numpy as jnp
    data = _mk(rng, 123_457)
    symbols = tuple(int(x) for x in np.flatnonzero(
        np.bincount(data, minlength=256)))
    fn = jax.jit(xfer.pack_nibbles_device, static_argnames=("symbols",))
    packed = fn(jnp.asarray(data), symbols=symbols)
    out = xfer.unpack_nibbles_host(np.asarray(packed), symbols, len(data))
    assert np.array_equal(out, data)
