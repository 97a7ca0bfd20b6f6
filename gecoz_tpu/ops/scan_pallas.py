"""Single-pass streaming scans (Pallas): cumsum / cummax / reverse-cummin.

XLA lowers `jnp.cumsum`/`lax.cummax` on TPU to a log-depth algorithm —
~log2(n) full passes over HBM (~2 ms / 4 Mi int32 measured, ~25x off
memory bandwidth).  The suffix-array kernels leans on n-wide scans
everywhere (group-boundary cumsums every rerank round, the reverse cummin
run-key pass, the chunked cummax broadcast fills), so those passes are a
double-digit share of encode time at chr1 scale.

This kernel streams the array once: a sequential grid over [R, 128]
chunks, Hillis-Steele within the chunk on VMEM (masked `pltpu.roll`
steps — lanes first, then a broadcast row scan), and a scalar carry in
SMEM that flows across grid steps.  One HBM read + one write, total.

Only int32, the dtype of every scan in the SA pipeline.  Dispatchers
(`cumsum_i32` etc.) use the kernel on TPU and fall back to jnp elsewhere;
GECOZ_NO_PALLAS=1 forces the fallback.  Mosaic support verified on-chip
(tools/probe_scan.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_R = 512                       # chunk rows; chunk = R*128 int32 = 256 KiB
_C = _R * 128

_UNITS = {"add": 0, "max": -(2 ** 31), "min": (2 ** 31) - 1}


def _combine(op, a, b):
    if op == "add":
        return a + b
    if op == "max":
        return jnp.maximum(a, b)
    return jnp.minimum(a, b)


def _make_kernel(op: str):
    unit = _UNITS[op]

    def kernel(x_ref, o_ref, carry_ref):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.int32(unit)

        x = x_ref[:]                                   # [R, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_R, 128), 1)
        d = 1
        while d < 128:                                 # lane-wise scan
            sh = pltpu.roll(x, d, axis=1)
            x = jnp.where(lane >= d, _combine(op, x, sh), x)
            d *= 2
        # row scan of the per-row totals (broadcast over lanes)
        tot = jnp.broadcast_to(x[:, 127:128], (_R, 128))
        row = jax.lax.broadcasted_iota(jnp.int32, (_R, 128), 0)
        d = 1
        while d < _R:
            sh = pltpu.roll(tot, d, axis=0)
            tot = jnp.where(row >= d, _combine(op, tot, sh), tot)
            d *= 2
        # exclusive row prefix + the running carry
        pe = jnp.where(row >= 1, pltpu.roll(tot, 1, axis=0),
                       jnp.int32(unit))
        carry = carry_ref[0]
        o_ref[:] = _combine(op, _combine(op, x, pe), carry)
        carry_ref[0] = _combine(op, carry, tot[_R - 1, 0])

    return kernel


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _scan_pallas(x: jax.Array, op: str, interpret: bool = False) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    pad = (-n) % _C
    xp = jnp.concatenate(
        [x, jnp.full((pad,), _UNITS[op], jnp.int32)]) if pad else x
    rows = xp.shape[0] // 128
    xp = xp.reshape(rows, 128)
    out = pl.pallas_call(
        _make_kernel(op),
        grid=(rows // _R,),
        in_specs=[pl.BlockSpec((_R, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_R, 128), lambda i: (i, 0),
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
    """Inclusive REVERSE cummin, int32 (flip + single forward pass + flip
    on TPU — still 3 linear passes vs XLA's ~log2(n))."""
    if x.ndim != 1 or x.shape[0] < 2 * _C or _is_batched(x) \
            or not _use_pallas():
        return jax.lax.cummin(x, reverse=True)
    return jnp.flip(_scan_pallas(jnp.flip(x), "min"))
