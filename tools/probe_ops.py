"""True per-op costs at n=4M: chain K copies inside one jit, subtract rtt."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 22
    K = 8
    rng = np.random.default_rng(0)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 20, size=n, dtype=np.int32)))
    perm = jax.device_put(jnp.asarray(rng.permutation(n).astype(np.int32)))
    iota = None

    def timeit(jf, *a):
        t0 = time.perf_counter()
        int(np.asarray(jf(*a)))
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(jf(*a)))
            best = min(best, time.perf_counter() - t0)
        return c, best

    def chain(op):
        def f(x, p):
            acc = x
            for t in range(K):
                acc = op(acc, p, t)
            return jnp.sum(acc[::65536].astype(jnp.int32))
        return jax.jit(f)

    i32 = jnp.arange(n, dtype=jnp.int32)

    # rtt baseline: K trivial adds
    c, t0 = timeit(chain(lambda x, p, t: x + t), keys, perm)
    print(f"baseline(K adds): {t0*1e3:.1f} ms", flush=True)

    def one(name, op):
        c, t = timeit(chain(op), keys, perm)
        print(f"{name}: {(t - t0)/K*1e3:.2f} ms/op (compile {c:.0f}s)",
              flush=True)

    one("sort 3op2key", lambda x, p, t: jax.lax.sort(
        (x + t, p, i32), num_keys=2)[0])
    one("sort 5op4key", lambda x, p, t: jax.lax.sort(
        (x + t, p, x, p, i32), num_keys=4)[0])
    one("gather rand", lambda x, p, t: x[(p + t) % n])
    one("scatter rand", lambda x, p, t:
        jnp.zeros(n, jnp.int32).at[p].set(x + t))
    one("cumsum", lambda x, p, t: jnp.cumsum(x) + t)
    one("cummin rev", lambda x, p, t: jax.lax.cummin(x + t, reverse=True))
    one("shifted slice", lambda x, p, t: jax.lax.dynamic_slice(
        jnp.concatenate([x, jnp.full((n,), -1, jnp.int32)]), (t,), (n,)))

    from gecoz_tpu.ops.sa_device import _sort_rerank
    one("sort_rerank", lambda x, p, t: _sort_rerank(x + t, p, i32)[0])


if __name__ == "__main__":
    main()
