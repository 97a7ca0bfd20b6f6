"""Stage breakdown of the CURRENT run-aware device SA (instrumented copy).

Replicates _suffix_array_runs_jit stage by stage with separate jits so each
stage's wall time (incl. the ~30 ms dispatch floor, printed separately) is
visible, plus the packed-round count and group trajectory.

Run:  python tools/probe_sa2.py [log2_n]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gecoz_tpu.ops import sa_device as sd
    from tools.probe_sa import synth_dna

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << lg
    s_np = synth_dna(n)
    d = jax.device_put(jnp.asarray(s_np))
    syms = tuple(int(x) for x in np.unique(s_np))
    print(f"# n=2^{lg} sigma={len(syms)}", flush=True)

    def timeit(f, *a, repeat=5):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    null = jax.jit(lambda x: jnp.sum(x[:8].astype(jnp.int32)))
    null(d)
    rtt = timeit(null, d)
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)

    iota = jnp.arange(n, dtype=jnp.int32)
    eb = int(n).bit_length()
    sym_bits = max(len(syms), 1).bit_length()

    def seed(s):
        codes = jnp.zeros((n,), jnp.int32)
        for sym in syms:
            codes = codes + (s >= jnp.uint8(sym)).astype(jnp.int32)
        nxt = jnp.concatenate([codes[1:], jnp.full((1,), -1, jnp.int32)])
        is_end = codes != nxt
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), is_end[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        m = run_id[n - 1] + 1
        below_end = nxt < codes
        packed = jnp.where(is_end, (iota << 1) | below_end.astype(jnp.int32),
                           jnp.int32(2) * n)
        v = jax.lax.cummin(packed, reverse=True)
        below = ((v & 1)).astype(jnp.bool_)
        ell = (v >> 1) - iota + 1
        above = (~below).astype(jnp.int32)
        key = ((codes << (1 + eb)) | (above << eb)
               | jnp.where(below, ell, (1 << eb) - ell))
        rank0, _, done0 = sd._sort_rerank1(key, iota)
        return rank0, is_start, run_id, m, done0

    seed_j = jax.jit(seed)
    r = seed_j(d); jax.block_until_ready(r)
    print(f"seed (scans + 1-key sort): {timeit(seed_j, d)*1e3:.1f} ms",
          flush=True)
    rank0, is_start, run_id, m, done0 = [jax.block_until_ready(x)
                                         for x in seed_j(d)]

    def compact(rank0, is_start):
        ckey = jnp.where(is_start, iota, (1 << 30) + iota)
        _, start_rank, starts_full = jax.lax.sort(
            (ckey, rank0, iota), num_keys=1)
        return start_rank, starts_full

    compact_j = jax.jit(compact)
    jax.block_until_ready(compact_j(rank0, is_start))
    print(f"compaction (1-key sort): "
          f"{timeit(compact_j, rank0, is_start)*1e3:.1f} ms", flush=True)
    start_rank, starts_full = compact_j(rank0, is_start)
    m_c = int(m)
    tok = jnp.where(iota < m_c, start_rank, n + iota)

    # the doubling loop, with a round counter and per-round group counts
    def shifted(r, k, m):
        padded = jnp.concatenate([r, jnp.full((n,), -1, jnp.int32)])
        out = jax.lax.dynamic_slice(padded, (k,), (n,))
        return jnp.where(iota + k >= m, -1, out)

    t3 = 1
    while (t3 + 1) ** 3 <= (1 << 31) - n - 2:
        t3 += 1
    t2 = 1
    while (t2 + 1) ** 2 <= (1 << 31) - n - 2:
        t2 += 1
    pad_key1 = jnp.int32((1 << 31) - 1) - (n - 1 - iota)

    def packed_round(rank, k, m):
        B = jnp.max(jnp.where(iota < m, rank, -1)) + 2

        def sh(t):
            off = jnp.where(k > n // t, jnp.int32(n), t * k)
            return shifted(rank, off, m) + 1
        r0 = rank
        r1, r2, r3, r4, r5 = sh(1), sh(2), sh(3), sh(4), sh(5)
        p3 = B <= t3
        p2 = B <= t2
        key1 = jnp.where(
            p3, (r0 * B + r1) * B + r2,
            jnp.where(p2, r0 * B + r1, r0))
        key2 = jnp.where(
            p3, (r3 * B + r4) * B + r5,
            jnp.where(p2, r2 * B + r3, r1))
        key1 = jnp.where(iota < m, key1, pad_key1)
        key2 = jnp.where(iota < m, key2, 0)
        rank, _, done = sd._sort_rerank(key1, key2, iota)
        mult = jnp.where(p3, 6, jnp.where(p2, 4, 2)).astype(jnp.int32)
        mult = jnp.where(k > ((1 << 31) - 1) // 6, 2, mult)
        return rank, k * mult, done, B

    round_j = jax.jit(lambda rank, k: packed_round(rank, k, m_c))
    jax.block_until_ready(round_j(tok, jnp.int32(1)))
    print(f"one packed round (2-key sort + 1-key sort): "
          f"{timeit(round_j, tok, jnp.int32(1))*1e3:.1f} ms", flush=True)

    # trace the actual trajectory
    rank, k, done, B = round_j(tok, jnp.int32(1))
    rounds = 1
    print(f"  round 1: B_in={int(B)} k_out={int(k)} done={bool(done)}",
          flush=True)
    while not bool(done) and int(k) < 2 * n:
        rank, k, done, B = round_j(rank, jnp.int32(int(k)))
        rounds += 1
        print(f"  round {rounds}: B_in={int(B)} k_out={int(k)} "
              f"done={bool(done)}", flush=True)

    def nr_fill(rank, starts_full, is_start):
        nrank = shifted(rank, 1, m_c)
        placed = jax.lax.sort((starts_full, nrank), num_keys=1)[1]
        val = placed + 1
        cb = 31 - max(1, (n - 1).bit_length())
        vbits = max(1, int(n).bit_length())
        chunks = -(-vbits // cb)
        nr = jnp.zeros((n,), jnp.int32)
        for c in range(chunks):
            chunk = (val >> (c * cb)) & ((1 << cb) - 1)
            pack = jnp.where(is_start, (iota << cb) | chunk, -1)
            fill = jax.lax.cummax(pack)
            nr = nr | ((fill & ((1 << cb) - 1)) << (c * cb))
        return nr - 1

    nr_j = jax.jit(nr_fill)
    jax.block_until_ready(nr_j(rank, starts_full, is_start))
    print(f"nr fill (1-key sort + chunked cummax): "
          f"{timeit(nr_j, rank, starts_full, is_start)*1e3:.1f} ms",
          flush=True)
    nr = nr_j(rank, starts_full, is_start)

    def final(rank0, nr, s):
        s_prev = jnp.concatenate([s[n - 1:], s[:n - 1]])
        if n < (1 << 23):
            packed_ib = (iota << 8) | s_prev.astype(jnp.int32)
            _, _, ob = jax.lax.sort((rank0, nr, packed_ib), num_keys=2)
            return ob >> 8, (ob & 255).astype(jnp.uint8)
        _, _, order, bwt = jax.lax.sort((rank0, nr, iota, s_prev),
                                        num_keys=2)
        return order, bwt

    final_j = jax.jit(final)
    jax.block_until_ready(final_j(rank0, nr, d))
    print(f"final sort: {timeit(final_j, rank0, nr, d)*1e3:.1f} ms",
          flush=True)

    full = jax.jit(lambda s: sd._suffix_array_runs_jit(s, syms=syms))
    jax.block_until_ready(full(d))
    print(f"TOTAL _suffix_array_runs_jit: {timeit(full, d)*1e3:.1f} ms "
          f"({rounds} packed rounds)", flush=True)

    from gecoz_tpu.ops.pipeline import index_block
    ib = jax.jit(lambda s: index_block(s))
    jax.block_until_ready(ib(d))
    print(f"TOTAL index_block: {timeit(ib, d)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
