"""End-to-end on-device pipelines: index-and-query, decode.

These compose the device kernels (suffix array, BWT, plane construction,
batched FM queries) into single jittable steps — the "forward pass" of the
framework.  The same functions shard over a mesh: the block dimension is
pure data parallelism, the in-block arrays shard along the sequence axis
(XLA inserts the collectives for the sorts/cumsums), and query batches
shard like activations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gecoz_tpu.ops.fmq import (DeviceFMBlock, build_device_block_jit,
                               decode_text_jit, locate_batch, search_batch,
                               with_kmer_table, with_lf_table)
from gecoz_tpu.ops.sa_device import (_suffix_array_jit,
                                     _suffix_array_runs_jit, bwt_device,
                                     dense_table)

# '\0' terminator + IUPAC-ish genomic alphabet (static plane set)
DNA_SYMBOLS = (0, 65, 67, 71, 78, 84)  # \0 A C G N T


@functools.partial(jax.jit, static_argnames=("sf", "symbols", "sa_impl",
                                             "m_pad", "ell_bits",
                                             "r1_keys"))
def index_block(s: jax.Array, sf: int = 5,
                symbols: tuple[int, ...] = DNA_SYMBOLS,
                sa_impl: str = "runs",
                m_pad: int | None = None,
                tok_table: jax.Array | None = None,
                ell_bits: int | None = None,
                r1_keys: int | None = None) -> DeviceFMBlock:
    """Raw block bytes -> device FM query state (SA -> BWT -> planes).

    sa_impl 'runs' (default) is robust to the long equal-symbol runs of
    real genomes; 'kmer' is the dense-packed doubling variant (a round or
    two faster on run-free text).  `m_pad` (static run-count bound,
    `sa_device.runs_m_pad`), `tok_table` (traced run-key table,
    `sa_device.runs_token_table`) and `r1_keys` (round-one sort width,
    `sa_device.runs_r1_keys`) are host-precomputed accelerators for
    the runs kernel — ~0.75n doubling sorts and sort-free compaction.
    """
    if sa_impl == "runs":
        # the run-aware sort emits the BWT as a free value operand of its
        # final sort (saves an n-wide gather); the static alphabet enables
        # the packed 1-key seed sort
        sa, bwt = _suffix_array_runs_jit(
            s, syms=symbols if len(symbols) <= 7 else None, m_pad=m_pad,
            tok_table=tok_table, ell_bits=ell_bits, r1_keys=r1_keys)
    else:
        table, bits = dense_table(symbols)
        sa = _suffix_array_jit(s, jnp.asarray(table), bits=bits)
        bwt = bwt_device(s, sa)
    return build_device_block_jit(bwt, sa, sf, symbols)


@functools.partial(jax.jit,
                   static_argnames=("sf", "symbols", "sa_impl"))
def index_and_query(s: jax.Array, patterns: jax.Array, lengths: jax.Array,
                    sf: int = 5, symbols: tuple[int, ...] = DNA_SYMBOLS,
                    sa_impl: str = "runs"):
    """One full forward step: build the index, run a search batch, locate
    every hit range's start row, and decode the text back.

    Returns (sp, ep, located_start, text) — exercising every kernel.
    """
    block = with_kmer_table(with_lf_table(
        index_block(s, sf=sf, symbols=symbols, sa_impl=sa_impl)))
    sp, ep = search_batch(block, patterns, lengths)
    start_vals = locate_batch(block, sp)
    text = decode_text_jit(block)
    return sp, ep, start_vals, text
