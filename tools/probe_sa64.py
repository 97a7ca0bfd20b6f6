"""Probe: where the 64 MiB device index time goes (VERDICT r4 item 2).

BENCH_r03: 4 MiB indexes at 35 MB/s but 64 MiB at 18.3 — 16x data, 32x
time.  Hypothesis: XLA's TPU sort is a multi-pass network (n log^2 n-ish),
so the per-round sorts dominate super-linearly.  This probe times, at n =
4/16/64 Mi on the real chip:

  1 raw lax.sort cost: 2-op and 3-op at each n (the primitive's scaling)
  2 the full run-aware SA kernel (one jit, early-exit while_loop)
  3 the same kernel with the doubling loop capped at r rounds, r = 0..6 —
    successive differences give the actual round count + per-round cost
  4 index_block end-to-end (SA + BWT + planes + ssa state)

Run on the real chip:  python tools/probe_sa64.py [max_mi]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    """Force execution via a scalar FETCH — on the remote-relay backend
    block_until_ready does not actually wait (bench.py uses the same
    workaround)."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return int(np.asarray(leaves[0].ravel()[:1])[0])


def timeit(fn, *args, repeat=2):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    max_mi = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from bench import synth_dna

    print(f"# device: {jax.devices()[0]}", flush=True)

    for mi in (4, 16, 64):
        if mi > max_mi:
            break
        n = mi << 20
        data = synth_dna(n, seed=11)
        d = jax.device_put(jnp.asarray(data))

        iota = jnp.arange(n, dtype=jnp.int32)
        k1 = jnp.asarray(np.random.default_rng(0).integers(
            0, n, size=n).astype(np.int32))
        k2 = jnp.asarray(np.random.default_rng(1).integers(
            0, n, size=n).astype(np.int32))

        s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        s3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
        _sync(s2(k1, iota))
        _sync(s3(k1, k2, iota))
        t2 = timeit(s2, k1, iota)
        t3 = timeit(s3, k1, k2, iota)
        print(f"[{mi}Mi] lax.sort 2-op {t2*1e3:.0f} ms  3-op {t3*1e3:.0f} ms"
              f"  ({t2/n*1e9:.2f} / {t3/n*1e9:.2f} ns/elem)", flush=True)

        from gecoz_tpu.ops.sa_device import _suffix_array_runs_jit
        syms = tuple(int(x) for x in np.unique(data))
        sa_fn = jax.jit(lambda s: _suffix_array_runs_jit(s, syms=syms)[0])
        t0 = time.perf_counter()
        _sync(sa_fn(d))
        print(f"[{mi}Mi] SA compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t_sa = timeit(sa_fn, d)
        print(f"[{mi}Mi] SA(runs) {t_sa*1e3:.0f} ms "
              f"-> {n/1e6/t_sa:.1f} MB/s", flush=True)

        from gecoz_tpu.ops.pipeline import index_block
        ib = jax.jit(index_block)
        t0 = time.perf_counter()
        _sync(ib(d))
        print(f"[{mi}Mi] index compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t_ib = timeit(ib, d)
        print(f"[{mi}Mi] index_block {t_ib*1e3:.0f} ms "
              f"-> {n/1e6/t_ib:.1f} MB/s  (SA share {t_sa/t_ib*100:.0f}%)",
              flush=True)

        # round census: run the doubling loop capped at r rounds;
        # timing differences between consecutive caps isolate one round
        import functools as ft
        prev = None
        for r in range(0, 7):
            fn = jax.jit(ft.partial(_capped_rounds, rounds=r, syms=syms))
            _sync(fn(d))
            t = timeit(fn, d)
            d_ms = (t - prev) * 1e3 if prev is not None else float("nan")
            print(f"[{mi}Mi] rounds<={r}: {t*1e3:.0f} ms"
                  + (f"  (+{d_ms:.0f} ms for round {r})"
                     if prev is not None else ""), flush=True)
            prev = t
        del d
    print("done", flush=True)


def _capped_rounds(s, rounds: int, syms):
    """Seed + compaction + at most `rounds` packed doubling rounds of the
    run-aware kernel (mirrors ops/sa_device.py::_suffix_array_runs_jit up
    to the loop; returns the rank array so XLA can't DCE the work)."""
    import jax
    import jax.numpy as jnp
    from gecoz_tpu.ops.sa_device import _sort_rerank, _sort_rerank1
    from gecoz_tpu.ops.scan_pallas import cummin_rev_i32, cumsum_i32

    n = s.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    eb = int(n).bit_length()
    sym_bits = max(len(syms), 1).bit_length()
    codes = jnp.zeros((n,), jnp.int32)
    for sym in syms:
        codes = codes + (s >= jnp.uint8(sym)).astype(jnp.int32)
    nxt = jnp.concatenate([codes[1:], jnp.full((1,), -1, jnp.int32)])
    is_end = codes != nxt
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), is_end[:-1]])
    run_id = cumsum_i32(is_start.astype(jnp.int32)) - 1
    m = run_id[n - 1] + 1
    below_end = nxt < codes
    packed = jnp.where(is_end, (iota << 1) | below_end.astype(jnp.int32),
                       jnp.int32(2) * n)
    v = cummin_rev_i32(packed)
    nde = v >> 1
    below = (v & 1).astype(jnp.bool_)
    ell = nde - iota + 1
    above = (~below).astype(jnp.int32)
    rank0 = ((codes << (1 + eb)) | (above << eb)
             | jnp.where(below, ell, (1 << eb) - ell))
    done0 = jnp.asarray(False)

    nst = (~is_start).astype(jnp.int32)
    nsts, vks, order1 = jax.lax.sort((nst, rank0, iota), num_keys=2)
    new_group = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((vks[1:] != vks[:-1])
         | (nsts[1:] != nsts[:-1])).astype(jnp.int32)])
    dvr = cumsum_i32(new_group) - 1
    pkey = jnp.where(iota < m, order1, (1 << 30) + iota)
    _, dense_rank, starts_full = jax.lax.sort(
        (pkey, dvr, order1), num_keys=1)
    tok = jnp.where(iota < m, dense_rank, n + iota)

    def shifted(r, k):
        padded = jnp.concatenate([r, jnp.full((n,), -1, jnp.int32)])
        out = jax.lax.dynamic_slice(padded, (k,), (n,))
        return jnp.where(iota + k >= m, -1, out)

    lim = (1 << 31) - n - 2
    tp = {}
    for p in (2, 3, 4, 5):
        t = 1
        while (t + 1) ** p <= lim:
            t += 1
        tp[p] = t
    pad_key1 = jnp.int32((1 << 31) - 1) - (n - 1 - iota)

    from gecoz_tpu.ops.sa_device import _sort_rerank_n

    def packed_round(rank, k, nkeys=2):
        B = jnp.max(jnp.where(iota < m, rank, -1)) + 2

        def sh(t):
            off = jnp.where(k > n // t, jnp.int32(n), t * k)
            return shifted(rank, off) + 1
        r = [rank] + [sh(t) for t in range(1, 5 * nkeys)]

        def pack(vals, B):
            acc = vals[0]
            for v in vals[1:]:
                acc = acc * B + v
            return acc
        keys = [r[j] for j in range(nkeys)]
        mult = jnp.int32(nkeys)
        for p in (2, 3, 4, 5):
            ok = B <= tp[p]
            keys = [jnp.where(ok, pack(r[j * p:(j + 1) * p], B), keys[j])
                    for j in range(nkeys)]
            mult = jnp.where(ok, jnp.int32(nkeys * p), mult)
        keys[0] = jnp.where(iota < m, keys[0], pad_key1)
        keys[1:] = [jnp.where(iota < m, kk, 0) for kk in keys[1:]]
        rank, _, done = _sort_rerank_n(tuple(keys), iota)
        mult = jnp.where(k > ((1 << 31) - 1) // (5 * nkeys), 2, mult)
        return rank, k * mult, done

    if rounds == 0:
        return tok
    rank, k1, done1 = packed_round(tok, jnp.int32(1), nkeys=3)

    def body(state):
        rank, k, _, r = state
        rank, k, done = packed_round(rank, k)
        return rank, k, done, r + 1

    def cond(state):
        _, k, done, r = state
        return jnp.logical_and(jnp.logical_and(~done, k < 2 * n),
                               r < rounds - 1)

    rank, _, _, nr = jax.lax.while_loop(
        cond, body, (rank, k1, done1 | done0, jnp.int32(0)))
    return rank + nr


if __name__ == "__main__":
    main()
