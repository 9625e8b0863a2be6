"""TPU sort micro v2 — tunnel-proof timing.

Through the axon tunnel block_until_ready can resolve before the chip
finishes (tools/sort_micro.py v1 reported 57 G elem/s sorts — impossible
vs HBM bandwidth).  This variant forces completion by fetching a scalar
reduction of the result to the host, and reports the MARGINAL cost of an
extra chained op: t(m ops) - t(1 op) over (m-1), which cancels the
round-trip + fetch overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def fetch_timed(fn, make_args, reps=5):
    """Time fn until a scalar of its output is ON THE HOST."""
    _ = np.asarray(fn(*make_args(0)))  # compile + warm
    best = float("inf")
    for r in range(1, reps + 1):
        args = make_args(r)
        import jax

        jax.block_until_ready(args)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    def dput(x):
        return jax.device_put(x, dev)

    def chain_sort(m):
        @jax.jit
        def f(x):
            for _ in range(m):
                x = jnp.sort(x ^ jnp.uint32(1))
            return x[:1].astype(jnp.int32).sum()

        return f

    def chain_scatter(m):
        @jax.jit
        def f(a, i):
            for _ in range(m):
                a = a.at[i].add(1, mode="drop")
            return a[:1].sum()

        return f

    def chain_gather(m):
        @jax.jit
        def f(a, i):
            s = jnp.int32(0)
            for _ in range(m):
                s = s + a[i].sum() // jnp.int32(1 << 30)
                a = a + s  # serialize the chain
            return s

        return f

    def chain_cumsum(m):
        @jax.jit
        def f(x):
            for _ in range(m):
                x = jnp.cumsum(x) % jnp.int32(3)
            return x[:1].sum()

        return f

    print("name                n        t1_ms    t5_ms   marg_ms     M/s")
    for name, maker, args_of in [
        ("sort_u32", chain_sort,
         lambda n: (lambda r: (dput(rng.integers(0, 1 << 31, n).astype(np.uint32)),))),
        ("cumsum_i32", chain_cumsum,
         lambda n: (lambda r: (dput(rng.integers(0, 3, n).astype(np.int32)),))),
        ("gather", chain_gather,
         lambda n: (lambda r: (dput(rng.integers(0, 1 << 10, n).astype(np.int32)),
                               dput(rng.integers(0, n, n).astype(np.int32))))),
        ("scatter_add", chain_scatter,
         lambda n: (lambda r: (dput(np.zeros(n, np.int32)),
                               dput(rng.integers(0, n, n).astype(np.int32))))),
    ]:
        for n in (4_000_000, 16_000_000):
            t1 = fetch_timed(maker(1), args_of(n))
            t5 = fetch_timed(maker(5), args_of(n))
            marg = max((t5 - t1) / 4, 1e-9)
            print(f"{name:16s} {n:>10} {t1*1e3:8.1f} {t5*1e3:8.1f} "
                  f"{marg*1e3:9.2f} {n/marg/1e6:9.1f}")


if __name__ == "__main__":
    main()
