"""Tunnel characterization: per-call latency, transfer bandwidth, scan rates.

Measures what the adaptive scan placement needs to know about THIS chip:
  * round-trip latency of a trivial device call (dispatch + sync),
  * host->device and device->host bandwidth at several sizes,
  * fused dense-scan (hash+probe) wall time at several contig sizes,
  * host native scan wall time at the same sizes.

Run: python tools/tunnel_micro.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def best_of(f, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import goldpolish_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from goldpolish_tpu import native
    from goldpolish_tpu.ops import bloom, bloom_jax

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", flush=True)

    # 1. round-trip latency: tiny jitted op, sync'd
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    f(tiny).block_until_ready()
    rt = best_of(lambda: f(tiny).block_until_ready(), reps=20)
    print(f"round-trip (tiny jit call): {rt*1e3:.2f} ms", flush=True)

    # also: full python-level np->device->np round trip of a tiny array
    def np_rt():
        np.asarray(f(jnp.asarray(np.zeros(8, np.float32))))
    np_rt()
    rt2 = best_of(np_rt, reps=20)
    print(f"round-trip (np->dev->np): {rt2*1e3:.2f} ms", flush=True)

    # 2. transfer bandwidth
    for mb in (1, 8, 64):
        a = np.zeros(mb << 20, np.uint8)
        jnp.asarray(a).block_until_ready()
        up = best_of(lambda: jnp.asarray(a).block_until_ready(), reps=3)
        d = jnp.zeros(mb << 20, jnp.uint8)
        d.block_until_ready()
        down = best_of(lambda: np.asarray(d), reps=3)
        print(f"h2d {mb} MiB: {mb/up:.0f} MiB/s ({up*1e3:.1f} ms)   "
              f"d2h: {mb/down:.0f} MiB/s ({down*1e3:.1f} ms)", flush=True)

    # 3. dense scan at sizes (device, end-to-end incl. upload + download)
    k, h = 32, 4
    rng = np.random.default_rng(0)
    for n in (1 << 20, 4 << 20, 16 << 20):
        codes = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].copy()
        bf_bytes = bloom.DEFAULT_BF_BYTES
        while bf_bytes < 2 * n:
            bf_bytes *= 2
        bf = bloom.BloomFilter(bf_bytes, h, k)
        bf.insert(native.nthash_all(codes[: n // 4], k, h))
        words = bloom_jax.to_device_words(bf)

        def dev_scan():
            packed = bloom_jax.probe_kmers_packed_jit(
                words, int(bf.bits), h, k, jnp.asarray(codes)
            )
            return np.asarray(packed)

        dev_scan()  # compile
        dt_dev = best_of(dev_scan, reps=3)

        def host_scan():
            return native.bf_contains(bf, native.nthash_all(codes, k, h))

        host_scan()
        dt_host = best_of(host_scan, reps=3)
        print(
            f"n={n>>20}M bf={bf_bytes>>20}MiB: device e2e {dt_dev*1e3:.0f} ms "
            f"({n/dt_dev/1e6:.0f} M win/s)  host {dt_host*1e3:.0f} ms "
            f"({n/dt_host/1e6:.0f} M win/s)", flush=True)


if __name__ == "__main__":
    main()
