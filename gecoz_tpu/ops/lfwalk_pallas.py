"""Fused LF-walk decode kernel (Pallas, VMEM-resident LF table).

The decode walk is the reference's `extract` hot loop (GSSA.java:241-251):
a chain of data-dependent LF-table lookups.  The XLA path (ops/fmq.py
`decode_text_jit`) runs one HBM gather kernel per fused step — every step
round-trips the walk state through HBM and pays gather latency against a
table too large to cache.

For blocks whose PACKED LF table (uint32 [(lf << 8) | sym], 4 bytes/row)
fits in VMEM, this kernel fuses ALL `rate` steps into one `pallas_call`:
the table is DMA'd HBM->VMEM once, the walk-state vector lives on-chip for
the whole walk, and each step is a VMEM-latency vector gather — no
per-step kernel launches, no HBM round trips.  Off-TPU (or for blocks
past the VMEM budget) callers fall back to the XLA path; under the
interpreter (tests) the kernel runs anywhere.

This is the capacity-limited tier of the decode stack:
  n <= ~2 Mi rows  -> this kernel (table + walk state + output in VMEM)
  larger           -> XLA fused-LF^k gathers (ops/fmq.decode_text_jit)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gecoz_tpu.ops.fmq import DeviceFMBlock, _lf_step, _row_with_sa

# Max table rows for the VMEM-resident kernel: 4n-byte table + walk state
# + the [rate, W] output must fit ~16 MB/core VMEM with headroom.
VMEM_ROWS_LIMIT = 2 << 20


def fits_vmem(block: DeviceFMBlock) -> bool:
    """True when the block's packed LF table can live in VMEM."""
    return (block.has_lf and block.lf_packed
            and 0 < block.n <= VMEM_ROWS_LIMIT)


def _make_kernel(rate: int):
    def kernel(tab_ref, seeds_ref, out_ref):
        tab = tab_ref[:]
        idx = seeds_ref[:]
        for j in range(rate):                 # static unroll, rate <= 128
            v = jnp.take(tab, idx, axis=0)    # VMEM vector gather
            out_ref[rate - 1 - j, :] = (v & 255).astype(jnp.uint8)
            # bits 30-8 = LF; bit 31 is the locate mark bit, strip it
            idx = ((v >> 8) & 0x7FFFFF).astype(jnp.int32)
    return kernel


def decode_walks_pallas(block: DeviceFMBlock, seeds: jax.Array,
                        interpret: bool | None = None) -> jax.Array:
    """All full walks in one kernel: seeds int32 [W] -> uint8 [rate, W]
    where out[c, w] = text[w * rate + c]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rate = 1 << block.sf
    W = seeds.shape[0]
    Wp = max(128, -(-W // 128) * 128)
    seeds_p = jnp.concatenate(
        [seeds.astype(jnp.int32), jnp.zeros((Wp - W,), jnp.int32)])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_kernel(rate),
        out_shape=jax.ShapeDtypeStruct((rate, Wp), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(block.lf_tab, seeds_p)
    return out[:, :W]


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_text_pallas_jit(block: DeviceFMBlock,
                           interpret: bool | None = None) -> jax.Array:
    """Full-text decode with the fused kernel (same walk schedule as
    ops/fmq.decode_text_jit: one walk per sampling interval; the ragged
    tail walks the single-step XLA path)."""
    n = block.n
    rate = 1 << block.sf
    W = (n - 1) // rate
    tail_lo = W * rate
    tail_len = (n - 1) - tail_lo

    if W:
        widx = jnp.arange(W, dtype=jnp.int32)
        seeds = _row_with_sa(block, (widx + 1) * rate)
        body = decode_walks_pallas(block, seeds, interpret)
        body = body.T.reshape(-1)             # [W*rate] text order
    else:
        body = jnp.zeros((0,), jnp.uint8)

    tail_out = jnp.zeros((rate,), dtype=jnp.uint8)
    if tail_len:
        def tbody(j, state):
            tidx, tail_out = state
            tnxt, tsym = _lf_step(block, tidx)
            return tnxt, tail_out.at[tail_len - 1 - j].set(tsym[0])

        _, tail_out = jax.lax.fori_loop(
            0, tail_len, tbody, (jnp.zeros((1,), jnp.int32), tail_out))

    text = jnp.concatenate([
        body,
        tail_out[:tail_len] if tail_len else jnp.zeros((0,), jnp.uint8),
        jnp.zeros((1,), jnp.uint8),           # final terminator at n-1
    ])
    return text[:n]
