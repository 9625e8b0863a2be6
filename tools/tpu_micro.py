"""TPU microbenchmarks: dense scan throughput + Pallas probe kernel.

Measures the device-side building blocks in isolation (no host commit):
  * all-window canonical ntHash + 4-hash Bloom probe rate (the ntEdit
    detection scan),
  * the Pallas VMEM-resident probe kernel vs the XLA gather path,
  * batched site-evaluation rate.

Run on a TPU host: python tools/tpu_micro.py [n_bases]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import goldpolish_tpu  # noqa: F401  (x64 + cache config)
    import jax
    import jax.numpy as jnp

    from goldpolish_tpu import native
    from goldpolish_tpu.ops import bloom, bloom_jax, nthash as nt

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 1024 * 1024
    k, h = 32, 4
    print(f"platform={jax.devices()[0].platform} n={n}", flush=True)
    rng = np.random.default_rng(0)
    codes = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].copy()
    bf_bytes = bloom.DEFAULT_BF_BYTES
    while bf_bytes < 2 * n:
        bf_bytes *= 2
    bf = bloom.BloomFilter(bf_bytes, h, k)
    bf.insert(native.nthash_all(codes[: n // 2], k, h))
    words = bloom_jax.to_device_words(bf)
    codes_dev = jnp.asarray(codes)

    # 1. dense scan (hash + probe every window)
    fn = lambda: bloom_jax.probe_kmers_jit(words, int(bf.bits), h, k, codes_dev)
    pres = np.asarray(fn())  # compile + correctness vs host
    host = native.bf_contains(bf, native.nthash_all(codes, k, h))
    print("scan parity:", np.array_equal(pres, host), flush=True)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = fn()
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"dense scan: {n/dt/1e6:.1f} M windows/s  ({dt*1e3:.1f} ms per {n})",
          flush=True)

    # 2. pallas probe kernel vs XLA gather probe on precomputed hashes.
    # Kernel paths use the reference-sized 512 KiB filter (the VMEM-resident
    # design point; the one-hot MXU lookup scales with table rows).
    bf_small = bloom.BloomFilter(bloom.DEFAULT_BF_BYTES, h, k)
    hashes = native.nthash_all(codes, k, h)
    bf_small.insert(hashes[: len(hashes) // 2])
    host = bf_small.contains(hashes)
    words = bloom_jax.to_device_words(bf_small)
    bf = bf_small
    lo32 = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo_dev = jnp.asarray(lo32)
    from goldpolish_tpu.ops import bloom_pallas

    # MXU one-hot lookup kernel (the working on-TPU kernel; the direct
    # dynamic-gather variant trips Mosaic's single-vreg gather limit)
    try:
        planes = bloom_pallas.words_to_planes(words)
        outm = np.asarray(bloom_pallas.probe_lo32_mxu(planes, int(bf.bits), lo_dev))
        print("mxu kernel parity:", np.array_equal(outm, host), flush=True)
        t0 = time.time()
        for _ in range(reps):
            o = bloom_pallas.probe_lo32_mxu(planes, int(bf.bits), lo_dev)
        o.block_until_ready()
        dtm = (time.time() - t0) / reps
        print(f"mxu kernel probe: {len(lo32)/dtm/1e6:.1f} M probes/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"mxu kernel unavailable: {type(e).__name__}: {e}", flush=True)
    ref = jax.jit(bloom_pallas.probe_lo32_reference, static_argnums=1)
    np.asarray(ref(words, int(bf.bits), lo_dev))
    t0 = time.time()
    for _ in range(reps):
        o = ref(words, int(bf.bits), lo_dev)
    o.block_until_ready()
    dtr = (time.time() - t0) / reps
    print(f"xla gather probe: {len(lo32)/dtr/1e6:.1f} M probes/s", flush=True)


if __name__ == "__main__":
    main()
