"""Suffix-array construction on device (JAX, jittable, mesh-shardable).

Prefix doubling: O(log n) rounds of a two-key int32 sort.  Sorting is the
one primitive XLA executes at speed-of-light on TPU, unlike the
reference's induced-sort pointer chasing (SAIS.java) which is irreducibly
serial and gather-bound.

Round-count optimization: initial ranks come from *dense-packed k-mers* —
symbols are mapped to a dense alphabet (0 reserved for past-the-end, which
is exactly the virtual-end comparison semantics) and ``chars_per`` symbols
are packed into one int31 word, so the first sort already orders by
``chars_per`` characters and doubling starts at k = chars_per.  For DNA
(4-bit dense codes, 7 chars/word) random genomic text finishes in 2-3
sorts instead of ~log2(n).

`lax.while_loop` gives the data-dependent early exit while keeping all
shapes static for XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("bits",))
def _suffix_array_jit(s: jax.Array, dense: jax.Array | None = None,
                      bits: int = 9):
    """Suffix array of `s` (uint8 [n]).

    `dense` maps byte -> dense code in [1, 2^bits); identity+1 when None.
    """
    n = s.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    if dense is None:
        codes = s.astype(jnp.int32) + 1
    else:
        codes = dense[s.astype(jnp.int32)]

    # pack chars_per dense codes into one int31 word (big-endian in the
    # word so integer order == lexicographic order)
    chars_per = max(1, 31 // bits)
    rank = jnp.zeros(n, dtype=jnp.int32)
    for t in range(chars_per):
        # static shift: slice + zero pad (past-the-end reads as 0 = minimal)
        tt = min(t, n)
        ch = jnp.concatenate([codes[tt:], jnp.zeros((tt,), jnp.int32)]) \
            if tt else codes
        rank = (rank << bits) | ch

    def shifted(r, k):
        # r[i+k] with -1 past the end: a dynamic slice of a padded buffer,
        # NOT a gather (random gathers are ~60ms/4M on v5e; slices are free)
        padded = jnp.concatenate([r, jnp.full((n,), -1, jnp.int32)])
        return jax.lax.dynamic_slice(padded, (k,), (n,))

    def sort_rerank(key1, key2):
        # NB more keys per round (prefix tripling/quadrupling) would cut
        # round counts on long runs, but >3-operand lax.sort inside a
        # while_loop blows up Mosaic compile time by an order of magnitude
        k1s, k2s, order = jax.lax.sort((key1, key2, iota), num_keys=2)
        new_group = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(jnp.int32)])
        ranks_in_order = (jnp.cumsum(new_group) - 1).astype(jnp.int32)
        rank = jnp.zeros(n, jnp.int32).at[order].set(ranks_in_order)
        done = ranks_in_order[n - 1] == n - 1
        return rank, order, done

    # compact the packed ranks with one sort
    rank, order, done0 = sort_rerank(rank, jnp.zeros(n, jnp.int32))

    def body(state):
        rank, order, k, _ = state
        rank, order, done = sort_rerank(rank, shifted(rank, k))
        return rank, order, k * 2, done

    def cond(state):
        _, _, k, done = state
        return jnp.logical_and(~done, k < 2 * n)

    # once ranks are all distinct, the last round's sort order IS the
    # suffix array — no final argsort needed
    _, order, _, _ = jax.lax.while_loop(
        cond, body, (rank, order, jnp.int32(chars_per), done0))

    return order.astype(jnp.int32)


def dense_table(symbols) -> tuple[np.ndarray, int]:
    """(byte -> dense code) table + static bits for a symbol set."""
    symbols = sorted(int(x) for x in symbols)
    table = np.zeros(256, dtype=np.int32)
    for i, sym in enumerate(symbols):
        table[sym] = i + 1
    bits = max(1, (len(symbols) + 1 - 1).bit_length())
    return table, bits


def suffix_array_device(s) -> jax.Array:
    """Suffix array of a uint8 array, computed on the default JAX device."""
    s = np.asarray(s, dtype=np.uint8)
    if s.shape[0] == 0:
        return jnp.zeros((0,), jnp.int32)
    table, bits = dense_table(np.unique(s))
    return _suffix_array_jit(jnp.asarray(s), jnp.asarray(table), bits=bits)


@jax.jit
def bwt_device(s: jax.Array, sa: jax.Array) -> jax.Array:
    """BWT[i] = s[(sa[i] - 1) mod n] on device."""
    n = s.shape[0]
    idx = jnp.where(sa == 0, n - 1, sa - 1)
    return s[idx]
