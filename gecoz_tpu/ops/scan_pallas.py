"""Single-pass streaming scans (Pallas): cumsum / cummax / segmented fill.

XLA lowers `jnp.cumsum`/`lax.cummax` on TPU to a log-depth algorithm —
~log2(n) full passes over HBM (~2 ms / 4 Mi int32 measured, ~25x off
memory bandwidth).  The suffix-array kernels leans on n-wide scans
everywhere (group-boundary cumsums every rerank round, the reverse
run-key pass, the segmented broadcast fills), so those passes are a
double-digit share of encode time at chr1 scale.

This kernel streams the array once: a sequential grid over [R, 128]
chunks, Hillis-Steele within the chunk on VMEM (masked `pltpu.roll`
steps — lanes first, then a broadcast row scan), and a scalar carry in
SMEM that flows across grid steps.  One HBM read + one write, total.

Two extensions beyond the r3 kernel:

* ``reverse=True`` runs the grid back-to-front (index-map reversal) and
  mirrors the rolls/masks, so suffix scans cost ONE pass instead of the
  flip + forward scan + flip triple.
* op ``"last"`` is the non-commutative *segmented fill*: the element
  nearest the output position that is >= 0 wins (unit -1).  Forward it
  broadcasts each marked value to every later position up to the next
  mark; reverse it propagates the next mark backwards.  This replaces
  the SA kernel's chunked ``(pos << cb | value_chunk)`` cummax fills
  (ceil(bits/cb) full passes) with a single pass, at any n.
  Combine-order convention throughout: ``_combine(op, closer, farther)``
  where "closer" is the element nearer the output position in scan
  direction — commutative ops don't care, "last" requires it.

Only int32, the dtype of every scan in the SA pipeline.  Dispatchers
(`cumsum_i32` etc.) use the kernel on TPU and fall back to jnp elsewhere;
GECOZ_NO_PALLAS=1 forces the fallback.  Mosaic support verified on-chip
(tools/probe_scan.py, tools/probe_fill.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_R = 512                       # chunk rows; chunk = R*128 int32 = 256 KiB
_C = _R * 128

_UNITS = {"add": 0, "max": -(2 ** 31), "min": (2 ** 31) - 1, "last": -1}


def _combine(op, closer, farther):
    """closer = element nearer the output position in scan direction."""
    if op == "add":
        return closer + farther
    if op == "max":
        return jnp.maximum(closer, farther)
    if op == "min":
        return jnp.minimum(closer, farther)
    # "last": nearest non-negative wins
    return jnp.where(closer >= 0, closer, farther)


def _make_kernel(op: str, reverse: bool):
    unit = _UNITS[op]

    def kernel(x_ref, o_ref, carry_ref):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.int32(unit)

        x = x_ref[:]                                   # [R, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (_R, 128), 0)
        d = 1
        while d < 128:                                 # lane-wise scan
            if reverse:
                sh = pltpu.roll(x, 128 - d, axis=1)    # element from i+d
                x = jnp.where(lane < 128 - d, _combine(op, x, sh), x)
            else:
                sh = pltpu.roll(x, d, axis=1)          # element from i-d
                x = jnp.where(lane >= d, _combine(op, x, sh), x)
            d *= 2
        # row scan of the per-row totals (broadcast over lanes)
        tcol = 0 if reverse else 127
        tot = jnp.broadcast_to(x[:, tcol:tcol + 1], (_R, 128))
        d = 1
        while d < _R:
            if reverse:
                sh = pltpu.roll(tot, _R - d, axis=0)
                tot = jnp.where(row < _R - d, _combine(op, tot, sh), tot)
            else:
                sh = pltpu.roll(tot, d, axis=0)
                tot = jnp.where(row >= d, _combine(op, tot, sh), tot)
            d *= 2
        # exclusive row prefix (suffix when reverse) + the running carry
        if reverse:
            pe = jnp.where(row < _R - 1, pltpu.roll(tot, _R - 1, axis=0),
                           jnp.int32(unit))
            chunk_total = tot[0, 0]
        else:
            pe = jnp.where(row >= 1, pltpu.roll(tot, 1, axis=0),
                           jnp.int32(unit))
            chunk_total = tot[_R - 1, 0]
        carry = carry_ref[0]
        o_ref[:] = _combine(op, _combine(op, x, pe), carry)
        carry_ref[0] = _combine(op, chunk_total, carry)

    return kernel


@functools.partial(jax.jit, static_argnames=("op", "reverse", "interpret"))
def _scan_pallas(x: jax.Array, op: str, reverse: bool = False,
                 interpret: bool = False) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    pad = (-n) % _C
    xp = jnp.concatenate(
        [x, jnp.full((pad,), _UNITS[op], jnp.int32)]) if pad else x
    rows = xp.shape[0] // 128
    xp = xp.reshape(rows, 128)
    nsteps = rows // _R
    if reverse:
        # process chunks back-to-front so the SMEM carry flows from the end
        index_map = lambda i: (nsteps - 1 - i, 0)      # noqa: E731
    else:
        index_map = lambda i: (i, 0)                   # noqa: E731
    out = pl.pallas_call(
        _make_kernel(op, reverse),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((_R, 128), index_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_R, 128), index_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(xp)
    return out.reshape(-1)[:n]


def _use_pallas() -> bool:
    # Default ON for TPU: validated on-chip (v5e, tools/probe_scan.py —
    # bit-exact, 1.5-1.9x over the XLA scans at 64Mi with both measures
    # at the dispatch-RTT floor).  GECOZ_NO_PALLAS=1 /
    # GECOZ_PALLAS_SCAN=0 force the jnp fallback.
    return (jax.default_backend() == "tpu"
            and os.environ.get("GECOZ_PALLAS_SCAN", "1") != "0"
            and not os.environ.get("GECOZ_NO_PALLAS"))


def _is_batched(x) -> bool:
    """True when `x` is being traced under vmap — the kernel's sequential
    grid + SMEM carry has no sound batching rule (a vmapped pallas_call
    crashed the TPU worker in the mesh encode path), so batched callers
    take the jnp fallback."""
    try:
        from jax._src.interpreters import batching
        return isinstance(x, batching.BatchTracer)
    except Exception:               # noqa: BLE001 — private API moved
        return True                 # can't tell: be safe, use jnp


def cumsum_i32(x: jax.Array) -> jax.Array:
    """Inclusive cumsum, int32 (single-pass on TPU)."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return jnp.cumsum(x.astype(jnp.int32)).astype(jnp.int32)
    return _scan_pallas(x.astype(jnp.int32), "add")


def cummax_i32(x: jax.Array) -> jax.Array:
    """Inclusive cummax, int32 (single-pass on TPU)."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return jax.lax.cummax(x)
    return _scan_pallas(x, "max")


def cummin_rev_i32(x: jax.Array) -> jax.Array:
    """Inclusive REVERSE cummin, int32 (single reverse-grid pass on TPU)."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return jax.lax.cummin(x, reverse=True)
    return _scan_pallas(x, "min", reverse=True)


def _fill_fallback(x: jax.Array, reverse: bool) -> jax.Array:
    """jnp fill: cummax/cummin over marked positions + one gather."""
    n = x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    if reverse:
        idx = jax.lax.cummin(jnp.where(x >= 0, iota, n), reverse=True)
        safe = jnp.minimum(idx, n - 1)
    else:
        idx = jax.lax.cummax(jnp.where(x >= 0, iota, -1))
        safe = jnp.maximum(idx, 0)
    return jnp.where((idx < 0) | (idx >= n), jnp.int32(-1), x[safe])


def fill_fwd_i32(x: jax.Array) -> jax.Array:
    """Segmented forward fill: out[i] = x[j] for the largest j <= i with
    x[j] >= 0, else -1.  Single pass on TPU (op "last")."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return _fill_fallback(x, reverse=False)
    return _scan_pallas(x, "last")


def fill_rev_i32(x: jax.Array) -> jax.Array:
    """Segmented backward fill: out[i] = x[j] for the smallest j >= i with
    x[j] >= 0, else -1.  Single reverse-grid pass on TPU."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return _fill_fallback(x, reverse=True)
    return _scan_pallas(x, "last", reverse=True)
