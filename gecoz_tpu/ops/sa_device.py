"""Suffix-array construction on device (JAX, jittable, mesh-shardable).

Prefix doubling: O(log n) rounds of a 64-bit key sort.  Sorting is the one
primitive XLA executes at speed-of-light on TPU, unlike the reference's
induced-sort pointer chasing (SAIS.java) which is irreducibly serial and
gather-bound.  Each round sorts composite keys ``rank[i] * (n+1) +
rank[i+k] + 1`` packed in int64 (ranks < n <= 2^31) and re-ranks with a
vectorized adjacent-difference cumsum.

`lax.while_loop` gives the data-dependent early exit (most genomes resolve
in far fewer than log2(n) rounds once ranks become distinct) while keeping
all shapes static for XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("ret_rank",))
def _suffix_array_jit(s: jax.Array, ret_rank: bool = False):
    n = s.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    # initial ranks = byte values; order via one sort
    rank = s.astype(jnp.int32)

    def shifted(r, k):
        idx = iota + k
        return jnp.where(idx < n, r[jnp.minimum(idx, n - 1)], jnp.int32(-1))

    def rerank(key_sorted, order):
        new_group = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (key_sorted[1:] != key_sorted[:-1]).astype(jnp.int32)])
        ranks_in_order = jnp.cumsum(new_group) - 1
        return jnp.zeros(n, jnp.int32).at[order].set(
            ranks_in_order.astype(jnp.int32))

    def body(state):
        rank, k, _ = state
        key2 = shifted(rank, k)
        # two-key lexicographic sort keeps everything in int32 (TPU-friendly)
        k1s, k2s, order = jax.lax.sort((rank, key2, iota), num_keys=2)
        new_group = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(jnp.int32)])
        ranks_in_order = (jnp.cumsum(new_group) - 1).astype(jnp.int32)
        rank = jnp.zeros(n, jnp.int32).at[order].set(ranks_in_order)
        done = ranks_in_order[n - 1] == n - 1
        return rank, k * 2, done

    def cond(state):
        _, k, done = state
        return jnp.logical_and(~done, k < 2 * n)

    # one initial round with k=0 semantics folded in: key = byte ranks
    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank, jnp.int32(1), jnp.bool_(False)))

    sa = jnp.argsort(rank).astype(jnp.int32)
    if ret_rank:
        return sa, rank
    return sa


def suffix_array_device(s) -> jax.Array:
    """Suffix array of a uint8 array, computed on the default JAX device."""
    s = jnp.asarray(np.asarray(s, dtype=np.uint8))
    if s.shape[0] == 0:
        return jnp.zeros((0,), jnp.int32)
    return _suffix_array_jit(s)


@jax.jit
def bwt_device(s: jax.Array, sa: jax.Array) -> jax.Array:
    """BWT[i] = s[(sa[i] - 1) mod n] on device."""
    n = s.shape[0]
    idx = jnp.where(sa == 0, n - 1, sa - 1)
    return s[idx]
