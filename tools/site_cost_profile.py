"""Per-error-kind cost of the native walk (present handed over).

Isolates what ~100us/error is spent on: sub-only drafts vs del-only vs
ins-only, and mode 0 vs 1.
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

N = int(os.environ.get("N", 2_000_000))
K = 32
SPACING = 400


def mutate(truth: bytes, kind: str) -> tuple[bytes, int]:
    segments = []
    prev = 0
    n = 0
    positions = np.arange(2 * K, len(truth) - 2 * K, SPACING)
    for p in positions:
        p = int(p)
        if kind in ("del", "ins"):
            q = p
            while q < p + 32 and (truth[q] == truth[q - 1] or truth[q] == truth[q + 1]):
                q += 1
            p = q
        segments.append(truth[prev:p])
        base = truth[p : p + 1]
        if kind == "sub":
            segments.append(b"A" if base != b"A" else b"G")
            prev = p + 1
        elif kind == "del":
            prev = p + 1
        else:
            ins = next(c for c in (b"T", b"G", b"C", b"A")
                       if c != truth[p - 1 : p] and c != base)
            segments.append(ins + base)
            prev = p + 1
        n += 1
    segments.append(truth[prev:])
    return b"".join(segments), n


def main():
    truths, _d, bf_by_k, _n, _s, _rb = bench.build_scenario_flat(N, 1)
    truth = truths[0]
    cfg = ntedit_config_for_k(K)
    print(f"cfg: mode={cfg.mode} max_ins={cfg.max_insertions} "
          f"max_del={cfg.max_deletions} jump={cfg.jump} mask={cfg.mask}")
    bf = bf_by_k[K]
    tables = siteeval.make_tables(cfg.k, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions, snv=bool(cfg.snv))
    for kind in ("sub", "del", "ins", "none"):
        if kind == "none":
            draft, n_err = truth, 0
        else:
            draft, n_err = mutate(truth, kind)
        codes = np.frombuffer(draft, np.uint8)
        pres = native.bf_contains(bf, native.nthash_all(codes, K, cfg.h))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, recs, st = native.polish_contig(draft, bf, cfg, tables,
                                                 present=pres)
            best = min(best, time.perf_counter() - t0)
        per_err = best / max(n_err, 1) * 1e6
        fixed = st.n_subs + st.n_ins + st.n_dels
        print(f"{kind:4s}: {len(draft)/best/1e6:7.1f} Mbp/s  "
              f"errors={n_err} fixed={fixed} masked={st.n_masked} "
              f"us/err={per_err:8.1f}  exact={out.upper() == truth.upper()}")


if __name__ == "__main__":
    main()
