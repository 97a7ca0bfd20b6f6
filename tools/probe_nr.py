"""Probe: the run-SA `nr` broadcast (token rank of the next run, expanded
run-wide) — gather vs sort+segmented-cummax fill (VERDICT r1 #6).

`_suffix_array_runs_jit` ends with `nr = shifted(rank,1)[run_id]`, the only
random gather in the algorithm (~30 ms/4Mi measured r1).  Alternative:

  1. compaction sort by (~is_start, iota) carrying iota gives
     starts_full[j] = position of the j-th run start (j < m) — in the real
     pipeline this rides the existing token-compaction sort for free;
  2. placement: apply_perm(starts_full, nrank) — one 1-key sort — lands
     nrank[j] at start position p_j;
  3. run-wide broadcast = exact segmented forward fill via cummax on
     packed (start_pos << b | value_chunk) words: the prefix max is always
     the most recent start's pack because start_pos occupies the high
     bits.  chunks = ceil(value_bits / (31 - pos_bits)) cummax passes —
     the same monotone-position packing trick the seed phase uses for run
     ends (reverse cummin).

Run on the real chip:  python tools/probe_nr.py [log2_n]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tools.probe_sa import synth_dna

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << lg
    d = jax.device_put(jnp.asarray(synth_dna(n)))
    print(f"# n = 2^{lg}", flush=True)

    def timeit(f, *a, repeat=5):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            int(np.asarray(f(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    def prep(s):
        """Shared state: run structure + a stand-in token rank array."""
        iota = jnp.arange(n, dtype=jnp.int32)
        codes = s.astype(jnp.int32) + 1
        nxt = jnp.concatenate([codes[1:], jnp.full((1,), -1, jnp.int32)])
        is_end = codes != nxt
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), is_end[:-1]])
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        m = run_id[n - 1] + 1
        # stand-in for the final token rank (any int32 array works for perf)
        rank = (iota * jnp.int32(-1640531535)) >> 10   # 2654435761 as i32
        rank = jnp.where(iota < m, rank & (n - 1), -1)
        return iota, is_start, run_id, m, rank

    def shifted(r, k, m, iota):
        padded = jnp.concatenate([r, jnp.full((n,), -1, jnp.int32)])
        out = jax.lax.dynamic_slice(padded, (k,), (n,))
        return jnp.where(iota + k >= m, -1, out)

    def ck(x):
        return jnp.sum(x[:: max(1, n // 64)].astype(jnp.int32))

    def fill_nr(iota, is_start, m, nrank, ride_free: bool):
        """nr broadcast via placement sort + segmented cummax fill."""
        _, _, starts_full = jax.lax.sort(
            ((~is_start).astype(jnp.int32), iota, iota), num_keys=2)
        if ride_free:
            # in the real pipeline this sort rides the existing token
            # compaction; exclude a stand-in for it from the measure by
            # folding it into a cheap checksum dependency only
            pass
        placed = jax.lax.sort((starts_full, nrank), num_keys=1)[1]
        val = placed + 1                       # [-1, n) -> [0, n+1)
        b = 31 - lg
        chunks = -(-(lg + 1) // b)
        out = jnp.zeros((n,), jnp.int32)
        for c in range(chunks):
            chunk = (val >> (c * b)) & ((1 << b) - 1)
            pack = jnp.where(is_start, (iota << b) | chunk, -1)
            fill = jax.lax.cummax(pack)
            out = out | ((fill & ((1 << b) - 1)) << (c * b))
        return out - 1

    # A: the shipped gather
    def var_gather(s):
        iota, is_start, run_id, m, rank = prep(s)
        nrank = shifted(rank, 1, m, iota)
        return ck(nrank[run_id])

    # B: two sorts + fill (standalone cost)
    def var_fill(s):
        iota, is_start, run_id, m, rank = prep(s)
        nrank = shifted(rank, 1, m, iota)
        return ck(fill_nr(iota, is_start, m, nrank, ride_free=False))

    # C: placement sort + fill only (compaction assumed free in context)
    def var_fill_ctx(s):
        iota, is_start, run_id, m, rank = prep(s)
        nrank = shifted(rank, 1, m, iota)
        # starts_full precomputed outside the measured region in context;
        # here approximate by reusing iota-identity when every position is
        # a start is wrong, so just measure placement+fill on the real one
        _, _, starts_full = jax.lax.sort(
            ((~is_start).astype(jnp.int32), iota, iota), num_keys=2)
        starts_full = jax.lax.stop_gradient(starts_full)
        placed = jax.lax.sort((starts_full, nrank), num_keys=1)[1]
        val = placed + 1
        b = 31 - lg
        chunks = -(-(lg + 1) // b)
        out = jnp.zeros((n,), jnp.int32)
        for c in range(chunks):
            chunk = (val >> (c * b)) & ((1 << b) - 1)
            pack = jnp.where(is_start, (iota << b) | chunk, -1)
            fill = jax.lax.cummax(pack)
            out = out | ((fill & ((1 << b) - 1)) << (c * b))
        return ck(out - 1)

    def check(s):
        iota, is_start, run_id, m, rank = prep(s)
        nrank = shifted(rank, 1, m, iota)
        a = nrank[run_id]
        b_ = fill_nr(iota, is_start, m, nrank, ride_free=False)
        return jnp.all(a == b_)

    assert bool(jax.jit(check)(d)), "fill variant mismatch"
    print("# fill variant bit-exact vs gather", flush=True)

    for name, f in [("A gather (shipped)  ", jax.jit(var_gather)),
                    ("B 2 sorts + fill    ", jax.jit(var_fill))]:
        f(d)
        print(f"{name}: {timeit(f, d)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
