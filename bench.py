"""Headline benchmark: polished bases/sec/chip through the ntEdit engine.

Scenario (mirrors the reference's hot path on its bundled test shape):
a synthetic multi-contig draft with ~0.25% mixed errors is polished against
a Bloom filter built from simulated reads of the truth genome — the ntEdit
detect+fix scan that dominates GoldPolish runtime.  Three configurations are
measured on the same inputs:

  * baseline_1t — ONE host thread running the faithful reference algorithm
    (native walker + host dense scan, the same semantics as the reference's
    ntedit-gr per-thread loop).  This replaces round 1's guessed CPU figure:
    vs_baseline is now measured-vs-measured.
  * host-only — all host cores (fork pool), host dense scan.
  * device — the production hybrid path: fused MXU conv-hash + Bloom-probe
    scans run on the TPU through the lookahead pipeline (polish/scanpipe)
    while the host cores walk; adaptive placement may demote to host if the
    chip link loses (reported as scan=host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is the production configuration's polished bases/s/chip and vs_baseline is
value / baseline_1t.  stderr carries the full breakdown, including the
whole-pipeline rate (BF build + polish) and exact-recovery status.

Env knobs: GPTPU_BENCH_BASES (default 8M), GPTPU_BENCH_CONTIGS (default 8),
GPTPU_BENCH_PROCS (default cpu count), GPTPU_BENCH_BACKEND (numpy forces
host-only), GPTPU_PROFILE (jax profiler trace dir).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

K, H = 32, 4
K_VALUES = [32, 28]  # the bench's multi-k editing chain (pipeline uses 4 k's)


def build_scenario(n_bases: int, n_contigs: int, seed: int = 0):
    """Truth contigs, reads->per-k BFs (native stream fill), mutated drafts."""
    from goldpolish_tpu import bf_builder, native
    from goldpolish_tpu.ops import bloom

    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n_bases)
    ].tobytes()
    step = max(K, n_bases // n_contigs)
    truths = [truth[i : i + step] for i in range(0, n_bases, step)]
    if len(truths) > 1 and len(truths[-1]) < 4 * K:
        truths[-2] += truths.pop()

    # size the filter for ~n distinct k-mers: 16 bits/kmer at h=4 keeps the
    # false-positive rate ~0.25% (the reference's fixed 512 KiB overloads
    # beyond ~300 kbp and the editor goes blind); power of two for the fast
    # masked probe path
    bf_bytes = bloom.DEFAULT_BF_BYTES
    while bf_bytes < n_bases * 2:  # 2 bytes = 16 bits per expected k-mer
        bf_bytes *= 2
    bfs = [bloom.BloomFilter(bf_bytes, H, k) for k in K_VALUES]
    cbfs = [
        bloom.CountingBloomFilter8(bloom.DEFAULT_CBF_BYTES, H, k)
        for k in K_VALUES
    ]
    # reads: 20 kb fragments, 5 staggered coverage passes (stagger offsets
    # so boundary k-mers clear the counting threshold; extra head reads
    # keep contig heads covered), per-contig so no read spans a boundary
    frag = 20_000
    reads: list[bytes] = []
    for t in truths:
        for rep in range(5):
            off = rep * (frag // 5)
            reads.append(t[: frag + K])  # head coverage every pass
            for s in range(off, len(t), frag):
                reads.append(t[s : s + frag + K])
    t0 = time.time()
    native.fill_bfs_stream(reads, [5] * len(reads), H, K_VALUES, cbfs, bfs)
    bf_build_s = time.time() - t0
    read_bases = sum(len(r) for r in reads)
    batch_bfs = bf_builder.BatchBFs(list(K_VALUES), cbfs, bfs)

    # mutate each contig: ~0.25% mixed errors, kept >= 2k from contig ends
    # (the reference editor legitimately cannot fix a window that lacks k
    # flanking bases — errors at synthetic cut points are a fixture bug,
    # not an engine gap).  Indels avoid homopolymer context: the reference
    # algorithm (and therefore the parity-pinned oracle) leaves
    # run-extending/shrinking indels unfixed — a known ntEdit limitation,
    # not an engine property this bench should measure.
    err_spacing = 400
    n_err = 0
    drafts = []
    for t in truths:
        positions = np.arange(2 * K, len(t) - 2 * K, err_spacing)
        segments = []
        prev = 0
        for i, p in enumerate(positions):
            kind = i % 3
            if kind == 1:  # deletion: skip run-adjacent sites
                q = int(p)
                while q < p + 32 and (
                    t[q] == t[q - 1] or t[q] == t[q + 1]
                ):
                    q += 1
                p = q
            segments.append(t[prev:p])
            base = t[p : p + 1]
            if kind == 0:  # substitution
                segments.append(b"A" if base != b"A" else b"G")
                prev = p + 1
            elif kind == 1:  # deletion from draft
                prev = p + 1
            else:  # insertion into draft: char differs from both neighbors
                ins = next(
                    c for c in (b"T", b"G", b"C", b"A")
                    if c != t[p - 1 : p] and c != base
                )
                segments.append(ins + base)
                prev = p + 1
        segments.append(t[prev:])
        drafts.append(b"".join(segments))
        n_err += len(positions)
    return truths, drafts, batch_bfs, n_err, bf_build_s, read_bases


def _chain_fn(engines, drafts, procs):
    """One multi-k editing chain pass (each k's output feeds the next —
    reference scripts/goldpolish-ntedit:20-29)."""

    def chain():
        cur = drafts
        stats = [0, 0, 0]
        for eng in engines:
            results = eng.polish_many(cur, processes=procs)
            cur = [out for out, _r, _e in results]
            stats[0] += sum(e.n_subs for _o, _r, e in results)
            stats[1] += sum(e.n_ins for _o, _r, e in results)
            stats[2] += sum(e.n_dels for _o, _r, e in results)
        return cur, stats

    return chain


def _timed_chain(engines, drafts, procs, reps=3):
    chain = _chain_fn(engines, drafts, procs)
    chain()  # warmup (compiles, pools)
    dt = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = chain()
        dt = min(dt, time.time() - t0)
    return dt, out


def _timed_interleaved(chains: dict, reps: int = 5):
    """min-of-reps for several configs with the reps INTERLEAVED in time —
    this box's neighbor noise swings 2x between identical runs, so arms
    timed in separate windows are incomparable; interleaving samples the
    same noise for every arm."""
    outs = {}
    best = {name: float("inf") for name in chains}
    for name, c in chains.items():  # warmups (compiles, pools)
        outs[name] = c()
    for _ in range(reps):
        for name, c in chains.items():
            t0 = time.time()
            outs[name] = c()
            best[name] = min(best[name], time.time() - t0)
    return best, outs


def main():
    from goldpolish_tpu.polish.multik import ntedit_config_for_k
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    t_start = time.time()

    def mark(msg):
        print(f"# [{time.time()-t_start:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    jax = None
    backend = os.environ.get("GPTPU_BENCH_BACKEND")
    if backend == "numpy":
        platform = "host"  # pure-host run: skip jax init (and any TPU grant)
    else:
        import jax

        platform = jax.devices()[0].platform
        on_accel = platform not in ("cpu",)
        backend = backend or ("hybrid" if on_accel else "numpy")
    n_bases = int(os.environ.get("GPTPU_BENCH_BASES", 8_000_000))
    n_contigs = max(1, int(os.environ.get("GPTPU_BENCH_CONTIGS", 8)))
    procs = int(os.environ.get("GPTPU_BENCH_PROCS", os.cpu_count() or 1))

    truths, drafts, batch_bfs, n_err, bf_build_s, read_bases = build_scenario(
        n_bases, n_contigs
    )
    mark("scenario built")
    total = sum(len(d) for d in drafts)

    def engines_for(bk):
        return [
            NtEditTPU(ntedit_config_for_k(k), batch_bfs.bf_for_k(k), backend=bk)
            for k in K_VALUES
        ]

    # measured reference baseline: ONE thread, host scan + native walk (the
    # reference algorithm at native speed) on a ~2 Mbp prefix
    base_drafts = drafts[: max(1, len(drafts) // 4)]
    host_engines = engines_for("numpy")
    t_1t, _ = _timed_chain(host_engines, base_drafts, procs=1)
    rate_1t = sum(len(d) for d in base_drafts) / t_1t
    mark("baseline_1t done")

    # the two placement arms, reps interleaved (see _timed_interleaved):
    # "host" = host-only engines; "adaptive" = production hybrid engines
    # whose per-k A/B placement is first driven to a lock by untimed
    # calibration passes (each k's scan lands wherever it measured faster —
    # the clean late-k pass typically locks host, the error-dense first k
    # the device), then timed in its locked configuration.
    scan = "host"
    scan_detail = ""
    if backend != "numpy":
        dev_engines = engines_for(backend)
        mark("hybrid engines built (placement probes done)")
        calibrate = _chain_fn(dev_engines, drafts, procs)
        for _ in range(4):  # A/B needs 2 device + 1 host samples, + lock
            calibrate()
            mark("calibration pass")
        profile_dir = os.environ.get("GPTPU_PROFILE")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        best, outs_map = _timed_interleaved({
            "host": _chain_fn(host_engines, drafts, procs),
            "adaptive": calibrate,
        })
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"# jax profiler trace -> {profile_dir}", file=sys.stderr)
        mark("interleaved timing done")
        rate_host = total / best["host"]
        rate_dev = total / best["adaptive"]
        # which k's locked the device? (an A/B "host" lock keeps the
        # scanner object around — read the placement table, not the engine)
        from goldpolish_tpu.polish import ntedit_tpu as _nt

        locks = {
            k_: ab.get("locked") or "device"
            for (k_, _h, _p), ab in _nt._AB_RUNS.items()
        }
        scan = "device" if any(v == "device" for v in locks.values()) else "host"
        scan_detail = ",".join(f"k{k_}={v}" for k_, v in sorted(locks.items()))
        chain_out = outs_map["adaptive" if rate_dev >= rate_host else "host"]
    else:
        t_host, chain_out = _timed_chain(host_engines, drafts, procs=procs)
        rate_host = total / t_host
        rate_dev = rate_host
    outs, chain_stats = chain_out

    headline = rate_dev if scan != "host" else rate_host
    polish_s = total / headline
    pipeline_rate = total / (bf_build_s + polish_s)

    # exact recovery (mask=1 lowercases unfixable sites; the pipeline's
    # final to-upper stage case-folds, so compare case-folded)
    truth_all = b"".join(truths)
    out_u = b"".join(outs).upper()
    n_subs, n_ins, n_dels = chain_stats
    recovered = out_u == truth_all
    if len(out_u) == len(truth_all):
        residual = int(np.sum(
            np.frombuffer(out_u, np.uint8) != np.frombuffer(truth_all, np.uint8)
        ))
    else:
        residual = abs(len(out_u) - len(truth_all))

    result = {
        "metric": "polished_bases_per_sec_chip",
        "value": round(headline, 1),
        "unit": "bases/s/chip",
        "vs_baseline": round(headline / rate_1t, 3),
    }
    print(json.dumps(result))
    print(
        f"# platform={platform} backend={backend} scan={scan}"
        f"{'(' + scan_detail + ')' if scan_detail else ''} "
        f"n={total} contigs={len(drafts)} procs={procs} errors={n_err} "
        f"fixed: s{n_subs} i{n_ins} d{n_dels} "
        f"recovered={recovered} residual~{residual} | "
        f"baseline_1t={rate_1t/1e6:.2f} Mbp/s host_all={rate_host/1e6:.2f} "
        f"device={rate_dev/1e6:.2f} | bf_build_s={bf_build_s:.2f} "
        f"({read_bases/1e6:.0f} Mb reads) "
        f"pipeline={pipeline_rate/1e6:.2f} Mbp/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
