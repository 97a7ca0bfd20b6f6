"""Breakdown probe for the device SA pipeline on the real chip."""
import sys
import time

import numpy as np


def synth_dna(n, seed=7):
    rng = np.random.default_rng(seed)
    syms = np.frombuffer(b"ACGT", np.uint8)
    data = rng.choice(syms, size=n, p=[0.29, 0.21, 0.21, 0.29]).astype(np.uint8)
    data[: n // 200] = ord("N")
    cuts = np.sort(rng.choice(np.arange(1, n - 1), size=3, replace=False))
    data[cuts] = 0
    data[n - 1] = 0
    return data


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 22
    d = jax.device_put(jnp.asarray(synth_dna(n)))

    def timeit(f, *a, repeat=3):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            int(np.asarray(f(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    def ck(tree):
        acc = jnp.int32(0)
        for l in jax.tree_util.tree_leaves(tree):
            l = jnp.ravel(l)
            acc += jnp.sum(l[:: max(1, l.shape[0] // 64)].astype(jnp.int32))
        return acc

    from gecoz_tpu.ops import sa_device as sd
    from gecoz_tpu.ops.fmq import build_device_block_jit

    # floor: one 3-operand sort at n
    def sort3(x):
        i = jnp.arange(n, dtype=jnp.int32)
        a = x.astype(jnp.int32)
        o = jax.lax.sort((a, i, i), num_keys=2)
        return ck(o)
    f = jax.jit(sort3); f(d)
    print(f"sort3 n=2^22: {timeit(f, d)*1e3:.1f} ms", flush=True)

    def sort2(x):
        i = jnp.arange(n, dtype=jnp.int32)
        a = x.astype(jnp.int32)
        o = jax.lax.sort((a, i), num_keys=1)
        return ck(o)
    f = jax.jit(sort2); f(d)
    print(f"sort2 n=2^22: {timeit(f, d)*1e3:.1f} ms", flush=True)

    def sort4(x):
        i = jnp.arange(n, dtype=jnp.int32)
        a = x.astype(jnp.int32)
        o = jax.lax.sort((a, i, i, i), num_keys=2)
        return ck(o)
    f = jax.jit(sort4); f(d)
    print(f"sort4(2key) n=2^22: {timeit(f, d)*1e3:.1f} ms", flush=True)

    # how many doubling rounds does the runs path take? replicate its body
    # but return the final k
    def rounds(s):
        iota = jnp.arange(n, dtype=jnp.int32)
        codes = s.astype(jnp.int32) + 1
        nxt = jnp.concatenate([codes[1:], jnp.full((1,), -1, jnp.int32)])
        is_end = codes != nxt
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), is_end[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        m = run_id[n - 1] + 1
        below_end = nxt < codes
        packed = jnp.where(is_end, (iota << 1) | below_end.astype(jnp.int32),
                           jnp.int32(2) * n)
        v = jax.lax.cummin(packed, reverse=True)
        nde = v >> 1
        below = (v & 1).astype(jnp.bool_)
        ell = nde - iota + 1
        key1 = (codes << 1) | (~below).astype(jnp.int32)
        key2 = jnp.where(below, ell, -ell)
        rank0, _, done0 = sd._sort_rerank(key1, key2, iota)
        drop = jnp.where(is_start, run_id, n)
        tok = (n + iota).at[drop].set(rank0, mode="drop")

        def shifted(r, k):
            padded = jnp.concatenate([r, jnp.full((n,), -1, jnp.int32)])
            out = jax.lax.dynamic_slice(padded, (k,), (n,))
            return jnp.where(iota + k >= m, -1, out)

        def body(state):
            rank, k, _, c = state
            rank, _, done = sd._sort_rerank(rank, shifted(rank, k), iota)
            return rank, k * 2, done, c + 1

        def cond(state):
            _, k, done, _ = state
            return jnp.logical_and(~done, k < 2 * n)

        rank, _, done1 = sd._sort_rerank(tok, shifted(tok, 1), iota)
        rank, _, _, c = jax.lax.while_loop(
            cond, body, (rank, jnp.int32(2), done1 | done0, jnp.int32(1)))
        ng = jnp.max(rank) + 1
        return jnp.stack([c, m, ng, jnp.max(ell)])
    f = jax.jit(rounds)
    out = np.asarray(f(d))
    # second call for steady state timing of the counting variant
    print(f"runs path: doubling_rounds={out[0]} nruns={out[1]} "
          f"final_groups={out[2]} maxrun={out[3]}", flush=True)

    full = jax.jit(lambda s: ck(sd._suffix_array_runs_jit(s)))
    full(d)
    print(f"full runs SA+BWT: {timeit(full, d)*1e3:.1f} ms", flush=True)

    # seed-only: stop before while loop (1 seed sort + 1 token sort)
    def seed(s):
        iota = jnp.arange(n, dtype=jnp.int32)
        codes = s.astype(jnp.int32) + 1
        nxt = jnp.concatenate([codes[1:], jnp.full((1,), -1, jnp.int32)])
        is_end = codes != nxt
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), is_end[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        below_end = nxt < codes
        packed = jnp.where(is_end, (iota << 1) | below_end.astype(jnp.int32),
                           jnp.int32(2) * n)
        v = jax.lax.cummin(packed, reverse=True)
        nde = v >> 1
        below = (v & 1).astype(jnp.bool_)
        ell = nde - iota + 1
        key1 = (codes << 1) | (~below).astype(jnp.int32)
        key2 = jnp.where(below, ell, -ell)
        rank0, _, _ = sd._sort_rerank(key1, key2, iota)
        return ck(rank0)
    f = jax.jit(seed); f(d)
    print(f"seed phase (1 sort + scans): {timeit(f, d)*1e3:.1f} ms",
          flush=True)

    # block build alone
    sa, bwt = jax.jit(sd._suffix_array_runs_jit)(d)
    sa = jax.block_until_ready(sa)
    bb = jax.jit(lambda b, s: ck(build_device_block_jit(b, s, 5,
                                                        (0, 65, 67, 71, 78, 84))))
    bb(bwt, sa)
    print(f"block build: {timeit(bb, bwt, sa)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
