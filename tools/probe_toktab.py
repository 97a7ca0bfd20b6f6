"""Probe: host-tabled compaction (tok_table) on the real chip.

Times the run-aware SA at 4/64 Mi with the full round-4b accelerator set
(m_pad + tok_table) against the sort-compaction baseline, and asserts
bit-identical output.  Run:  python tools/probe_toktab.py [max_mi]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return int(np.asarray(leaves[0].ravel()[:1])[0])


def timeit(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import synth_dna
    from gecoz_tpu.ops.sa_device import (_suffix_array_runs_jit, runs_m_pad,
                                         runs_token_table)

    max_mi = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"# device: {jax.devices()[0]}", flush=True)

    for mi in (4, 64):
        if mi > max_mi:
            break
        nn = mi << 20
        data = synth_dna(nn, seed=11)
        d = jax.device_put(jnp.asarray(data))
        syms = tuple(int(v) for v in np.unique(data))
        mp = runs_m_pad(data)
        t0 = time.perf_counter()
        tab = runs_token_table(data, syms)
        print(f"[{mi}Mi] host table: {time.perf_counter()-t0:.2f}s, "
              f"{int(np.count_nonzero(tab != (1 << 31) - 1))} keys, "
              f"m_pad={mp/nn:.3f}n", flush=True)
        td = jnp.asarray(tab)

        base = jax.jit(lambda s: _suffix_array_runs_jit(
            s, syms=syms, m_pad=mp)[0])
        fast = jax.jit(lambda s, t: _suffix_array_runs_jit(
            s, syms=syms, m_pad=mp, tok_table=t)[0])
        t0 = time.perf_counter()
        sa0 = base(d)
        _sync(sa0)
        print(f"[{mi}Mi] base compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        sa1 = fast(d, td)
        _sync(sa1)
        print(f"[{mi}Mi] tabled compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        same = np.array_equal(np.asarray(sa0), np.asarray(sa1))
        print(f"[{mi}Mi] tabled == base: {same}", flush=True)
        if not same:
            print("MISMATCH — do not ship", flush=True)
            return
        del sa0, sa1
        tb = timeit(base, d)
        tf = timeit(fast, d, td)
        print(f"[{mi}Mi] SA base {tb*1e3:.0f} ms ({nn/1e6/tb:.1f} MB/s)  "
              f"tabled {tf*1e3:.0f} ms ({nn/1e6/tf:.1f} MB/s)", flush=True)
        del d
    print("done", flush=True)


if __name__ == "__main__":
    main()
