"""Profile the native walk: host dense scan vs walk-with-present.

Answers THE round-3 question: if the device hands the host present[] for
free, how fast is the remaining host work (the ceiling of the hybrid arm)?
Run host-only (no jax import).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from goldpolish_tpu import native
from goldpolish_tpu.ops import siteeval
from goldpolish_tpu.polish.multik import ntedit_config_for_k

N = int(os.environ.get("N", 4_000_000))
REPS = int(os.environ.get("REPS", 3))


def t_min(fn, reps=REPS):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    truths, drafts, bf_by_k, n_err, _s, _rb = bench.build_scenario_flat(N, 4)
    total = sum(len(d) for d in drafts)
    print(f"scenario: {total} bases, {len(drafts)} contigs, {n_err} errors")
    for k in bench.K_VALUES:
        cfg = ntedit_config_for_k(k)
        bf = bf_by_k[k]
        tables = siteeval.make_tables(cfg.k, cfg.jump, cfg.max_insertions,
                                      cfg.max_deletions, snv=bool(cfg.snv))
        codes = [np.frombuffer(d, np.uint8) for d in drafts]

        # 1. dense scan alone (hash + probe of every window)
        def scan_all():
            return [
                native.bf_contains(bf, native.nthash_all(c, k, cfg.h))
                for c in codes
            ]

        dt_scan, presents = t_min(scan_all)

        # 2. walk without present (scan inside the walk)
        def walk_noP():
            return [
                native.polish_contig(d, bf, cfg, tables) for d in drafts
            ]

        dt_walk, res0 = t_min(walk_noP)

        # 3. walk with present handed over
        def walk_P():
            return [
                native.polish_contig(d, bf, cfg, tables, present=p)
                for d, p in zip(drafts, presents)
            ]

        dt_walkp, res1 = t_min(walk_P)
        assert all(a[0] == b[0] for a, b in zip(res0, res1))

        # 4. second-pass (clean input) walk rates: polish output of pass 1
        outs = [r[0] for r in res0]
        ocodes = [np.frombuffer(o, np.uint8) for o in outs]

        def scan_clean():
            return [
                native.bf_contains(bf, native.nthash_all(c, k, cfg.h))
                for c in ocodes
            ]

        dt_scan2, pres2 = t_min(scan_clean)

        def walk_clean_P():
            return [
                native.polish_contig(o, bf, cfg, tables, present=p)
                for o, p in zip(outs, pres2)
            ]

        dt_walk2p, _ = t_min(walk_clean_P)

        def walk_clean_noP():
            return [native.polish_contig(o, bf, cfg, tables) for o in outs]

        dt_walk2, _ = t_min(walk_clean_noP)

        print(f"k={k}: DIRTY  scan={total/dt_scan/1e6:6.1f} Mbp/s  "
              f"walk(noP)={total/dt_walk/1e6:6.1f}  "
              f"walk(P)={total/dt_walkp/1e6:6.1f}")
        print(f"k={k}: CLEAN  scan={total/dt_scan2/1e6:6.1f} Mbp/s  "
              f"walk(noP)={total/dt_walk2/1e6:6.1f}  "
              f"walk(P)={total/dt_walk2p/1e6:6.1f}")


if __name__ == "__main__":
    main()
