"""Probe wide multi-key lax.sort compile+run on the real chip."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 22
    rng = np.random.default_rng(0)
    d = jax.device_put(jnp.asarray(rng.integers(0, 50, size=n, dtype=np.int32)))

    def probe(name, nkeys):
        iota = jnp.arange(n, dtype=jnp.int32)

        def f(x):
            ops = []
            for t in range(nkeys):
                ops.append(jnp.concatenate(
                    [x[t:], jnp.full((t,), -1, jnp.int32)]) if t else x)
            out = jax.lax.sort(tuple(ops) + (iota,), num_keys=nkeys)
            return jnp.sum(out[-1][::65536].astype(jnp.int32))
        jf = jax.jit(f)
        t0 = time.perf_counter()
        int(np.asarray(jf(d)))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(jf(d)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: compile {c:.1f}s run {best*1e3:.1f} ms", flush=True)

    probe("sort 2-key/3-op", 2)
    probe("sort 4-key/5-op", 4)
    probe("sort 6-key/7-op", 6)
    probe("sort 8-key/9-op", 8)


if __name__ == "__main__":
    main()


def block_breakdown():
    import jax
    import jax.numpy as jnp

    n = 1 << 22
    rng = np.random.default_rng(0)
    syms = np.frombuffer(b"\0ACGNT", np.uint8)
    bwt = jax.device_put(jnp.asarray(rng.choice(syms, size=n).astype(np.uint8)))
    sa = jax.device_put(jnp.asarray(rng.permutation(n).astype(np.int32)))

    def timeit(f, *a):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        int(np.asarray(jf(*a)))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(jf(*a)))
            best = min(best, time.perf_counter() - t0)
        return c, best

    from gecoz_tpu.ops.fmq import _plane_jit

    def planes7(b):
        b32 = b.astype(jnp.int32)
        acc = jnp.int32(0)
        for s in [0, 65, 67, 71, 78, 84, 99]:
            w, p = _plane_jit((b32 == s).astype(jnp.int32))
            acc += w[::4096].astype(jnp.int32).sum() + p[::4096].sum()
        return acc
    c, t = timeit(planes7, bwt)
    print(f"planes x7: compile {c:.1f}s run {t*1e3:.1f} ms", flush=True)

    def bc(b):
        return jnp.bincount(b.astype(jnp.int32), length=256)[::32].sum()
    c, t = timeit(bc, bwt)
    print(f"bincount: compile {c:.1f}s run {t*1e3:.1f} ms", flush=True)

    def nz(s):
        marked = (s & 31) == 0
        m = (n + 31) // 32
        (rows,) = jnp.nonzero(marked, size=m, fill_value=0)
        perm = (s[rows] >> 5).astype(jnp.int32)
        inv = jnp.zeros((m,), jnp.int32).at[perm].set(
            jnp.arange(m, dtype=jnp.int32))
        return perm[::512].sum() + inv[::512].sum()
    c, t = timeit(nz, sa)
    print(f"nonzero+perm+inv: compile {c:.1f}s run {t*1e3:.1f} ms",
          flush=True)

    def wrap(s):
        return jnp.argmax(s == 0).astype(jnp.int32)
    c, t = timeit(wrap, sa)
    print(f"argmax wrap: compile {c:.1f}s run {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    block_breakdown()
