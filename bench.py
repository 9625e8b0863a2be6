"""Headline benchmark: polished bases/sec/chip through the ntEdit engine.

Scenario (mirrors the reference's hot path on its bundled test shape):
a synthetic draft with ~0.25% mixed errors is polished against a Bloom
filter built from simulated reads of the truth genome — the ntEdit
detect+fix scan that dominates GoldPolish runtime.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md) and its
CPU binaries need btllib (absent here), so the baseline is a documented
estimate of the 48-thread CPU reference: ntEdit-class polishing sustains
roughly 2 Mbp/s on a 48-core node (3 Gbp human draft in ~25 min for the
multi-k chain).  vs_baseline = measured / 2.0e6.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_CPU_BASES_PER_SEC = 2.0e6
K, H = 32, 4


def build_scenario(n_bases: int, seed: int = 0):
    from goldpolish_tpu import native
    from goldpolish_tpu.ops import bloom, nthash as nt

    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n_bases)
    ].tobytes()

    # size the filter for ~n distinct k-mers: 16 bits/kmer at h=4 keeps the
    # false-positive rate ~0.25% (the reference's fixed 512 KiB overloads
    # beyond ~300 kbp and the editor goes blind); power of two for the fast
    # masked probe path
    bf_bytes = bloom.DEFAULT_BF_BYTES
    while bf_bytes < n_bases * 2:  # 2 bytes = 16 bits per expected k-mer
        bf_bytes *= 2
    bf = bloom.BloomFilter(bf_bytes, H, K)
    cbf = bloom.CountingBloomFilter8(bloom.DEFAULT_CBF_BYTES, H, K)
    frag, step = 20000, 10000
    t0 = time.time()
    for rep in range(5):  # 5 passes so k-mers clear the counting threshold
        for s in range(0, n_bases, step):
            chunk = np.frombuffer(truth[s : s + frag + K], np.uint8)
            native.fill_bfs(chunk, H, [K], 5, [cbf], [bf])
    bf_build_s = time.time() - t0

    # mutate: ~0.25% errors, mixed types, vectorized construction
    err_spacing = 400
    positions = np.arange(200, n_bases - 200, err_spacing)
    segments = []
    prev = 0
    tb = truth
    for i, p in enumerate(positions):
        segments.append(tb[prev:p])
        kind = i % 3
        base = tb[p : p + 1]
        if kind == 0:  # substitution
            segments.append(b"A" if base != b"A" else b"G")
            prev = p + 1
        elif kind == 1:  # deletion from draft
            prev = p + 1
            continue
        else:  # insertion into draft
            segments.append(b"T" + base)
            prev = p + 1
    segments.append(tb[prev:])
    draft = b"".join(segments)
    return truth, draft, bf, len(positions), bf_build_s


def main():
    import jax

    from goldpolish_tpu.polish import ntedit_oracle as ne
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    backend = os.environ.get("GPTPU_BENCH_BACKEND") or ("hybrid" if on_accel else "numpy")
    n_bases = int(os.environ.get("GPTPU_BENCH_BASES", 2_000_000))

    truth, draft, bf, n_err, bf_build_s = build_scenario(n_bases)
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1)
    eng = NtEditTPU(cfg, bf, backend=backend)

    # warmup: full-size run first, so the timed pass measures steady state
    # (the dense scan is shape-bucketed; a small-slice warmup would leave the
    # full-size bucket's XLA compile + constant upload inside the timed region)
    eng.polish_contig(draft)

    profile_dir = os.environ.get("GPTPU_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    out, recs, ed = eng.polish_contig(draft)
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# jax profiler trace -> {profile_dir}", file=sys.stderr)
    bases_per_sec = len(draft) / dt

    # mask=1 lowercases unfixable sites; case-fold like the pipeline's final
    # to-upper stage before comparing.  A single-k pass leaves a tail of
    # errors for the multi-k chain, so report the residual count too.
    out_u = out.upper()
    recovered = out_u == truth
    if len(out_u) == len(truth):
        residual = int(np.sum(np.frombuffer(out_u, np.uint8) != np.frombuffer(truth, np.uint8)))
    else:
        residual = abs(len(out_u) - len(truth))
    result = {
        "metric": "polished_bases_per_sec_chip",
        "value": round(bases_per_sec, 1),
        "unit": "bases/s/chip",
        "vs_baseline": round(bases_per_sec / BASELINE_CPU_BASES_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(
        f"# platform={platform} backend={backend} n={n_bases} "
        f"errors={n_err} fixed: s{ed.n_subs} i{ed.n_ins} d{ed.n_dels} "
        f"recovered={recovered} residual~{residual} polish_s={dt:.2f} bf_build_s={bf_build_s:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
