"""Decompose the hybrid arm's host-side costs on the bench scenario.

Measures, single-core, on the exact bench inputs (8 Mbp, 0.25% mixed
errors, k=32):
  * scan      — native dense scan alone (nthash_all + bf_contains),
  * walk+scan — native polish_contig with present=None (self-scan),
  * walk|pres — native polish_contig consuming a precomputed present[],
  * unpack    — np.unpackbits of the packed presence (parent-side cost),
  * pack      — np.packbits (parent-side cost per worker hand-off).

The delta (walk+scan) - (walk|pres) bounds what shipping presence bits
from the device can save per core; everything the parent spends beyond
that (packing, dispatch, waits) eats the margin.  Run on an idle box
(min-of-5; neighbor noise swings 2x).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

os.environ.setdefault("GPTPU_BENCH_BASES", "4000000")
os.environ.setdefault("GPTPU_BENCH_CONTIGS", "4")


def main():
    import bench
    from goldpolish_tpu import native
    from goldpolish_tpu.polish.multik import ntedit_config_for_k
    from goldpolish_tpu.ops import siteeval

    n_bases = int(os.environ["GPTPU_BENCH_BASES"])
    n_contigs = int(os.environ["GPTPU_BENCH_CONTIGS"])
    truths, drafts, bf_by_k, n_err, bf_s, read_bases = bench.build_scenario_flat(
        n_bases, n_contigs
    )
    k = 32
    cfg = ntedit_config_for_k(k)
    bf = bf_by_k[k]
    tables = siteeval.make_tables(cfg.k, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    total = sum(len(d) for d in drafts)
    print(f"# scenario: {total} bases, {n_contigs} contigs, {n_err} errors, "
          f"bf={bf.bytes >> 20} MiB")

    def timed(name, fn, reps=5):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best*1e3:9.1f} ms   {total/best/1e6:7.2f} Mbp/s")
        return out, best

    codes_list = [np.frombuffer(d, np.uint8) for d in drafts]

    def scan_only():
        outs = []
        for c in codes_list:
            outs.append(native.bf_contains(bf, native.nthash_all(c, k, cfg.h)))
        return outs

    presents, t_scan = timed("scan", scan_only)

    def walk_self():
        return [
            native.polish_contig(d, bf, cfg, tables, present=None)
            for d in drafts
        ]

    timed("walk+scan", walk_self)

    def walk_pres():
        return [
            native.polish_contig(d, bf, cfg, tables, present=p)
            for d, p in zip(drafts, presents)
        ]

    timed("walk|pres", walk_pres)

    packed = [np.packbits(p, bitorder="little") for p in presents]

    def unpack_all():
        return [
            np.unpackbits(pk, bitorder="little")[: len(p)].astype(bool)
            for pk, p in zip(packed, presents)
        ]

    timed("unpack", unpack_all)
    timed("pack", lambda: [np.packbits(p, bitorder="little") for p in presents])


if __name__ == "__main__":
    main()
