"""Pallas streaming-scan kernels: interpret-mode + dispatcher fallbacks.

The kernels are default-ON on TPU (ops/scan_pallas.py); on-chip
correctness/speed is probed by tools/probe_scan.py (artifacts/
PROBE_r3_scan.log).  These tests pin the kernel *logic* on every backend
via Pallas interpret mode — masked-roll Hillis-Steele within the chunk,
SMEM carry across sequential grid steps, tail padding with the op unit —
and the dispatchers' jnp fallbacks (small inputs, vmap, non-TPU).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gecoz_tpu.ops import scan_pallas as sp


def _fill_ref(x, reverse=False):
    """Nearest non-negative at-or-before (at-or-after when reverse)."""
    out = np.full_like(x, -1)
    it = range(x.size - 1, -1, -1) if reverse else range(x.size)
    last = -1
    for i in it:
        if x[i] >= 0:
            last = x[i]
        out[i] = last
    return out


@pytest.mark.parametrize("op,ref", [
    ("add", lambda x: np.cumsum(x, dtype=np.int64).astype(np.int32)),
    ("max", np.maximum.accumulate),
    ("min", np.minimum.accumulate),
    ("last", _fill_ref),
])
@pytest.mark.parametrize("n", [
    sp._C,              # exactly one chunk
    3 * sp._C,          # multiple grid steps (SMEM carry crosses chunks)
    2 * sp._C + 12345,  # ragged tail -> unit padding
])
def test_scan_kernel_interpret(op, ref, n, rng):
    x = rng.integers(-1000, 1000, size=n).astype(np.int32)
    got = np.asarray(sp._scan_pallas(jnp.asarray(x), op, interpret=True))
    assert np.array_equal(got, ref(x)), (op, n)


@pytest.mark.parametrize("op,ref", [
    ("min", lambda x: np.minimum.accumulate(x[::-1])[::-1]),
    ("last", lambda x: _fill_ref(x, reverse=True)),
])
@pytest.mark.parametrize("n", [sp._C, 3 * sp._C, 2 * sp._C + 12345])
def test_scan_kernel_reverse_interpret(op, ref, n, rng):
    # reverse grid: index map runs chunks back-to-front, rolls mirrored
    x = rng.integers(-1000, 1000, size=n).astype(np.int32)
    got = np.asarray(sp._scan_pallas(jnp.asarray(x), op, reverse=True,
                                     interpret=True))
    assert np.array_equal(got, ref(x)), (op, n)


@pytest.mark.parametrize("n", [777, 2 * sp._C + 7])
def test_fill_dispatchers(n, rng):
    # sparse marks (~1%), including none-before-first-mark prefixes
    x = np.full(n, -1, np.int32)
    marks = rng.choice(n, size=max(1, n // 100), replace=False)
    x[marks] = rng.integers(0, 1 << 30, size=marks.size).astype(np.int32)
    x[: n // 10] = -1                       # leading unmarked region
    assert np.array_equal(np.asarray(sp.fill_fwd_i32(jnp.asarray(x))),
                          _fill_ref(x))
    assert np.array_equal(np.asarray(sp.fill_rev_i32(jnp.asarray(x))),
                          _fill_ref(x, reverse=True))


def test_dispatchers_match_jnp(rng):
    # below the 2*_C size gate the dispatchers must use the jnp fallback
    # and still be exact
    x = rng.integers(-50, 50, size=777).astype(np.int32)
    assert np.array_equal(np.asarray(sp.cumsum_i32(jnp.asarray(x))),
                          np.cumsum(x))
    assert np.array_equal(np.asarray(sp.cummax_i32(jnp.asarray(x))),
                          np.maximum.accumulate(x))
    assert np.array_equal(np.asarray(sp.cummin_rev_i32(jnp.asarray(x))),
                          np.minimum.accumulate(x[::-1])[::-1])


def test_dispatchers_safe_under_vmap(rng):
    # the sequential-grid kernel has no batching rule: vmapped callers
    # must silently take the jnp fallback (a vmapped pallas_call crashed
    # the TPU worker in the mesh encode path — regression guard)
    x = rng.integers(0, 100, size=(3, 2 * sp._C + 7)).astype(np.int32)
    out = jax.vmap(sp.cumsum_i32)(jnp.asarray(x))
    assert np.array_equal(np.asarray(out),
                          np.cumsum(x, axis=1, dtype=np.int64)
                          .astype(np.int32))
