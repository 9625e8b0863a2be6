"""Two-phase batched ntEdit engine (the TPU-native editor).

The reference edits each contig with a sequential rolling scan — one Bloom
probe per position, branchy candidate trials at missing sites
(reference: subprojects/ntedit/ntedit.cpp:1414-1771).  On TPU that shape is
hopeless; this engine restructures the work without changing the result:

  PHASE A (device, dense, batched):
    * canonical multi-hash of *every* draft window (closed-form ntHash),
    * Bloom probes of every window -> present[],
    * detection masks (visited/eligible/check_missing) from present[],
    * candidate supports for every "hot site" via ops.siteeval — thousands
      of substitution/insertion/deletion probe-chains evaluated at once,
      tiered (short combos first, escalate the rare unresolved sites).

  PHASE B (host, sparse, exact):
    * a walker that *fast-forwards* between hot sites (clean regions are
      provably edit-free, so the sequential scan state can jump), replays
      the reference decision loop from the precomputed support tables
      (polish.ntedit_oracle.run_trials — the same code the oracle uses),
      applies edits through the oracle's rope machinery, and runs the
      oracle scan verbatim inside each post-edit "dirty zone" (the <=k
      windows whose content an edit changed) before returning to fast mode.

  The output is byte-identical to the oracle editor (differentially tested),
  hence to the reference algorithm.

Correctness argument for fast-forwarding: between consecutive hot sites the
scan makes no edit — every visited window either probes present (no
detection), is detection-ineligible near the end/non-ACGT (no trials), or
fails the check_missing gate (no trials).  None of those mutate sequence,
rope, or any state the future depends on, and the rolling hash state at a
pure-draft window is a pure function of the draft bytes — so the walker may
jump directly to the next hot window and reseed the hash.  After an edit,
state diverges from the draft only inside the dirty zone (windows whose span
overlaps modified content); the walker delegates those to the exact scalar
scan and resumes jumping once the window is past `dirty_end` and literal-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..ops import nthash as nt
from ..ops import siteeval
from . import ntedit_oracle as orc
from .ntedit_oracle import (
    MULTI_POSSIBLE_BASES,
    NUM_TRIES,
    Config,
    NeedMoreCombos,
    Node,
    _upper,
    accept_edit,
    find_first_accepted_kmer,
    new_best,
    run_trials,
    update_sub_best,
)

TIER0_COMBOS = 21  # insertion combos of length <= 3; escalate to 341 on demand


def _seed(seq, start: int, k: int) -> tuple[int, int]:
    """Window (fh, rh) via the native seeder when available (the Python
    scalar recurrence costs ~64 bigint rotations per call)."""
    try:
        from .. import native

        return native.seed_window(seq, start, k)
    except Exception:  # noqa: BLE001
        return nt.ntc64_base_i(seq, start, k)

_ACCEPTED_LUT = np.zeros(256, bool)
for _c in b"ATGCRYSWKMBDHV":
    _ACCEPTED_LUT[_c] = True
    _ACCEPTED_LUT[_c + 32] = True


class _TableProvider:
    """Trial provider reading precomputed site supports (ops.siteeval)."""

    def __init__(self, sup: siteeval.SiteSupports, si: int, draft: bytes, p: int,
                 mode2: bool = False):
        self.sup = sup
        self.si = si
        self.draft = draft
        self.p = p  # tail position of the site window
        self.mode2 = mode2
        self.applied_sub = False  # a gated sub trial ran (apply+revert effect)

    def sub_trial(self, ci):
        gate = bool(self.sup.gate[self.si, ci])
        if gate or self.mode2:
            # the reference's revert writes back toupper(draft_char)
            # (ntedit.cpp:1610), permanently uppercasing the position
            self.applied_sub = True
        return gate, int(self.sup.sub_support[self.si, ci])

    def ins_trial(self, ci, i):
        if i >= self.sup.n_combos:
            raise NeedMoreCombos
        return int(self.sup.ins_support[self.si, ci, i])

    def del_trial(self, d):
        return int(self.sup.del_support[self.si, d - 1])

    def deleted_bases(self, d):
        # clean mode: the d bases from the tail position are pure draft
        return bytes(self.draft[self.p : self.p + d])


@lru_cache(maxsize=64)
def _interleave_pattern(n_combos: int, n_dels: int, num_deletions: int):
    """Index arrays for the ins(0), del(d0), ins(1), del(d0+1), ... trial
    order — computed once per shape instead of a 341-iteration Python loop
    per site."""
    seq_len = n_combos + n_dels
    ins_pos = np.empty(n_combos, np.int64)
    del_pos = np.empty(n_dels, np.int64)
    is_del = np.zeros(seq_len, bool)
    payload = np.empty(seq_len, np.int32)
    pos = 0
    di = 0
    for i in range(n_combos):
        ins_pos[i] = pos
        payload[pos] = i
        pos += 1
        if di < n_dels:
            del_pos[di] = pos
            is_del[pos] = True
            payload[pos] = num_deletions + di
            pos += 1
            di += 1
    return ins_pos, del_pos, is_del, payload


def _engine_run_trials(cfg: Config, draft_char: int, provider: "_TableProvider"):
    """Mode-1 fast path of ntedit_oracle.run_trials.

    Semantically identical (the engine-vs-oracle differential suite pins
    it), but the 341-combo indel scan is replaced by a vectorized
    last-max-wins reduction over the support tables instead of ~1400 python
    trial calls per site.  Other modes fall back to the shared loop.
    """
    if cfg.mode != 1:
        return run_trials(cfg, draft_char, provider, 0)
    best = new_best()
    num_deletions = 1
    sup = provider.sup
    si = provider.si
    bases = cfg.bases_array.get(chr(draft_char), "")
    n_combos = NUM_TRIES[cfg.max_insertions]
    if sup.n_combos < n_combos:
        raise NeedMoreCombos
    for ci, sub_base_s in enumerate(bases):
        sub_base = ord(sub_base_s)
        gate, check_present = provider.sub_trial(ci)
        if not gate:
            continue
        if accept_edit(cfg, check_present):
            update_sub_best(best, sub_base, check_present)
            continue
        if best["edit_type"] == 1:
            continue
        # vectorized tryIndels: trial order ins(0), del(d0), ins(1),
        # del(d0+1), ..., with >= (last wins) accumulation
        ins_vals = sup.ins_support[si, ci, :n_combos]
        n_dels = max(0, min(n_combos, cfg.max_deletions - num_deletions + 1))
        del_vals = sup.del_support[si, num_deletions - 1 : num_deletions - 1 + n_dels]
        ins_pos, del_pos, is_del, payload = _interleave_pattern(
            n_combos, n_dels, num_deletions
        )
        vals = np.empty(n_combos + n_dels, np.int32)
        vals[ins_pos] = ins_vals
        vals[del_pos] = del_vals
        num_deletions += n_dels
        # deletions additionally require a positive raw count (the accepted
        # tryDeletion result is then tested > 0, run_trials)
        ok = np.where(
            is_del,
            (vals >= cfg.thr_del) & (vals > 0),
            vals >= cfg.thr_edit,
        )
        if not ok.any():
            continue
        m = vals[ok].max()
        idxs = np.flatnonzero(ok & (vals == m))
        j = int(idxs[-1])  # >= comparisons: the last maximal trial wins
        if is_del[j]:
            d = int(payload[j])
            best.update(
                edit_type=3, indel=provider.deleted_bases(d), num_support=int(m)
            )
        else:
            combo = MULTI_POSSIBLE_BASES[chr(sub_base)][int(payload[j])]
            best.update(edit_type=2, indel=combo.encode(), num_support=int(m))
        break  # found -> mode 1 exits the sub loop
    return best


@dataclass
class ScanMasks:
    present: np.ndarray
    hot: np.ndarray
    w0: int


@dataclass
class EditStats:
    """Picklable summary returned by polish_many's fork-pool path (the full
    editor object — rope nodes etc. — stays in the worker process)."""

    n_subs: int
    n_ins: int
    n_dels: int
    n_masked: int
    n_table_hits: int = 0
    n_table_giveups: int = 0


# A/B placement samples for polish_many, keyed by WORKLOAD CLASS
# (k, h, probe kind, filter-size bucket, batch-grain bucket):
# {"device": [rates], "host": [rates], "locked": mode|None} — shared across
# engine instances so per-batch engines (the production pipeline builds
# fresh ones per batch) converge after a couple of batches per k.  A lock
# is permanent FOR ITS CLASS: once both arms have samples the faster locks
# and the gate costs nothing thereafter (adaptive must never lose to its
# best arm — a periodic re-probe of the losing arm was measured costing
# ~3% of the locked arm at the per-batch grain).  A change in k, filter
# size, or batch grain is a new class and re-measures; noise robustness
# comes from best-of sampling (noise only ever slows an arm down) plus
# _AB_MIN_SAMPLES per arm before the lock decision.
_AB_RUNS: dict = {}
_AB_MIN_SAMPLES = 2   # device samples before host gets a look (first
                      # device call bears XLA compiles)
_AB_KEEP = 4          # freshest samples per arm considered for the decision


# Persistent-pool worker caches: engines keyed by (bf share path, cfg blob).
# Bounded FIFO — each (batch, k) generation makes one entry; old generations'
# mmaps release once their engines drop (see utils/procs.attach_array).
_WK_ENGINES: dict = {}
_WK_ENGINES_CAP = 12


def _pm_task(cfg_blob: bytes, bf_ref: tuple, env_flags: dict,
             seq: bytes, packed_present, nw: int, site_tables=None):
    """Persistent-pool walk task (utils/procs.get_pool): the config pickles
    through the call pipe (tiny), the Bloom filter attaches from the shared
    tmpfs buffer (bf_ref = (path, bytes)), and presence bits (device- or
    parent-computed) arrive bit-packed.  env_flags carries the parent's
    walk-relevant env at submit time — a persistent pool's inherited
    environ is frozen at its first fork."""
    import os as _os

    for name, val in env_flags.items():
        if val is None:
            _os.environ.pop(name, None)
        else:
            _os.environ[name] = val
    key = (bf_ref[0], cfg_blob)
    eng = _WK_ENGINES.get(key)
    if eng is None:
        import pickle

        from ..ops import bloom
        from ..utils.procs import attach_array

        cfg = pickle.loads(cfg_blob)
        path, nbytes = bf_ref
        bf = bloom.BloomFilter.__new__(bloom.BloomFilter)
        bf.bytes = nbytes
        bf.bits = np.uint64(nbytes * 8)
        bf._bits_i = nbytes * 8
        bf.hash_num = cfg.h
        bf.k = cfg.k
        bf.array = attach_array(path)[:nbytes]
        eng = NtEditTPU(cfg, bf, backend="numpy")
        while len(_WK_ENGINES) >= _WK_ENGINES_CAP:
            _WK_ENGINES.pop(next(iter(_WK_ENGINES)))
        _WK_ENGINES[key] = eng
    pres = None
    if packed_present is not None:
        pres = np.unpackbits(packed_present, bitorder="little")[:nw].astype(bool)
    out, recs, ed = eng.polish_contig(seq, present=pres,
                                      site_tables=site_tables)
    return out, recs, EditStats(
        ed.n_subs, ed.n_ins, ed.n_dels, ed.n_masked,
        getattr(ed, "n_table_hits", 0), getattr(ed, "n_table_giveups", 0),
    )


def _find_cuts(present: np.ndarray, k: int, n: int, n_pieces: int) -> list[int]:
    """Byte positions where a contig may be split for independent polishing.

    A cut is valid when the 4k windows around it all probe present: clean
    regions are provably edit-free (see the module docstring's
    fast-forward argument), no hot site or dirty zone can reach across the
    cut, and end-of-contig special cases only fire on windows that make no
    decisions there — so slices polish byte-identically to the whole.
    Targets are evenly spaced; each slides outward until it lands on a
    clean stretch (a target stuck in a dirty neighbourhood is dropped).
    """
    ps = np.concatenate([[0], np.cumsum(present.astype(np.int64))])
    n_win = len(present)

    def clean(a: int, b: int) -> bool:
        a, b = max(a, 0), min(b, n_win)
        return b > a and int(ps[b] - ps[a]) == b - a

    margin = 2 * k
    cuts: list[int] = []
    for p in range(1, n_pieces):
        t = p * n // n_pieces
        found = -1
        for off in range(0, max(64, n // (4 * n_pieces)), 64):
            for c in (t - off, t + off):
                if margin < c < n - margin and clean(c - margin, c + margin):
                    found = c
                    break
            if found >= 0:
                break
        if found >= 0 and (not cuts or found - cuts[-1] > 4 * margin):
            cuts.append(found)
    return cuts


class NtEditTPU:
    """Batched two-phase editor.

    backend:
      "numpy"  — host-only (native C++ eval when available),
      "jax"    — device dense scan + device candidate evaluation,
      "hybrid" — device dense scan, host-native candidate evaluation
                 (best when host<->device round trips are expensive, e.g.
                 a tunneled chip; the dense scan is the probe majority).
    """

    def __init__(self, cfg: Config, bf, backend: str = "numpy"):
        self.cfg = cfg
        self.bf = bf
        self.backend = backend
        self.tables = siteeval.make_tables(
            cfg.k, cfg.jump, cfg.max_insertions, cfg.max_deletions,
            snv=bool(cfg.snv),
        )
        self._jax = None
        self._scanner = None
        self._device_eval = backend == "jax"
        if backend == "jax":
            from ..ops import bloom_jax, siteeval_jax

            self._jax = (bloom_jax, siteeval_jax)
            self._words = bloom_jax.to_device_words(bf)
        elif backend == "hybrid":
            # device runs the fused dense scan (ops/scan_conv: MXU conv hash
            # + size-adaptive Bloom probe); host runs candidate eval + walk;
            # placement is A/B-measured per workload class in polish_many.
            # Construction is LAZY: the scanner (and its filter upload —
            # ~0.3 s per k per batch through the tunnel) only materializes
            # if a device mode is actually chosen; per-batch engines whose
            # workload class has locked host never pay it.
            self._scanner_lazy = True

    def _ensure_scanner(self):
        """Materialize the hybrid device scanner on first device use."""
        if self._scanner is not None or not getattr(self, "_scanner_lazy", False):
            return
        import os as _os

        from ..ops import scan_conv

        cfg = self.cfg
        self._scanner = scan_conv.DeviceScanner(self.bf)
        self._scanner_lazy = False
        # fused phase-A (scan + detection + site eval on device,
        # ops/scan_eval): the walker then replays trials from tables —
        # its heaviest per-site work — wherever the device's site
        # prediction hit.  Constraints mirror the native replay's.
        dev_eval = _os.environ.get("GPTPU_DEVICE_EVAL", "1")
        if (
            dev_eval != "0"
            and cfg.mode in (0, 1) and not cfg.snv
            and cfg.k <= 64 and cfg.h <= 16
            and cfg.max_insertions <= 5 and cfg.max_deletions <= 7
        ):
            from ..ops.scan_eval import EvalConfig

            self._scanner.enable_eval(
                EvalConfig(
                    k=cfg.k, h=cfg.h, jump=cfg.jump,
                    max_ins=cfg.max_insertions,
                    max_del=cfg.max_deletions,
                    thr_edit=cfg.thr_edit,
                    thr_missing=cfg.thr_missing, s_max=4096,
                ),
                self.tables,
                force=dev_eval == "1",
            )

    # -- persistent-pool state push -------------------------------------------
    def _bf_ref(self) -> tuple:
        """(path, bytes) of the filter's tmpfs share for pool workers
        (created once per engine; unlinked when the engine is collected)."""
        ref = getattr(self, "_bf_share", None)
        if ref is None:
            import weakref

            from ..utils import procs

            path = procs.share_array(self.bf.array)
            ref = (path, int(self.bf.bytes))
            self._bf_share = ref
            self._bf_share_fin = weakref.finalize(
                self, procs.unshare_array, path
            )
        return ref

    def _cfg_blob(self) -> bytes:
        blob = getattr(self, "_cfg_pickle", None)
        if blob is None:
            import pickle

            blob = pickle.dumps(self.cfg)
            self._cfg_pickle = blob
        return blob

    @staticmethod
    def _env_flags() -> dict:
        """Walk-relevant env captured at submit time (persistent-pool
        workers inherit environ from their first fork, not the caller's)."""
        import os as _os

        return {
            "GPTPU_NO_NATIVE_WALK": _os.environ.get("GPTPU_NO_NATIVE_WALK"),
        }

    def _use_native_walk(self) -> bool:
        """The full native walk (gp_polish_contig) replaces phases A+B when
        available: it runs trials only at truly visited sites with zero
        Python per-site overhead, and consumes a device-computed present[]
        when one is passed.  The jax backend (explicit device candidate
        eval) and GPTPU_NO_NATIVE_WALK=1 (the Python-engine differential
        tests) keep the two-phase path."""
        import os as _os

        if self._device_eval or _os.environ.get("GPTPU_NO_NATIVE_WALK"):
            return False
        cfg = self.cfg
        # gp_polish_contig's compiled limits; outside them the two-phase
        # engine (numpy/jax eval fallbacks) handles the config
        if cfg.k > 64 or cfg.h > 16 or cfg.max_deletions > 7 or cfg.max_insertions > 5:
            return False
        try:
            from .. import native

            native.lib()
            return True
        except Exception:  # noqa: BLE001
            return False

    def _find_cuts_probe(self, s: bytes, n_pieces: int) -> list[int]:
        """_find_cuts without a precomputed present[]: the clean-window
        test probes only the 4k windows around each candidate cut (a few
        hundred probes per cut vs a full dense scan), with the SAME
        clean criterion — identical cut decisions, so slices still polish
        byte-identically to the whole."""
        k = self.cfg.k
        n = len(s)
        n_win = n - k + 1
        margin = 2 * k

        def clean(a: int, b: int) -> bool:
            a, b = max(a, 0), min(b, n_win)
            if b <= a:
                return False
            seg = np.frombuffer(s[a : b + k - 1], np.uint8)
            return bool(self._present_host(seg).all())

        cuts: list[int] = []
        for p in range(1, n_pieces):
            t = p * n // n_pieces
            found = -1
            for off in range(0, max(64, n // (4 * n_pieces)), 64):
                for c in (t - off, t + off):
                    if margin < c < n - margin and clean(c - margin, c + margin):
                        found = c
                        break
                if found >= 0:
                    break
            if found >= 0 and (not cuts or found - cuts[-1] > 4 * margin):
                cuts.append(found)
        return cuts

    # -- phase A --------------------------------------------------------------
    def _present_host(self, codes: np.ndarray) -> np.ndarray:
        """Host-side dense scan (native when available)."""
        k, h = self.cfg.k, self.cfg.h
        try:
            from .. import native

            return native.bf_contains(self.bf, native.nthash_all(codes, k, h))
        except Exception:  # noqa: BLE001
            base = nt.canonical_hashes(codes, k)
            return self.bf.contains(nt.multi_hashes(base, k, h))

    def _probe_all(self, codes: np.ndarray) -> np.ndarray:
        k, h = self.cfg.k, self.cfg.h
        n = len(codes)
        import os as _os

        if _os.environ.get("GPTPU_FORCE_DEVICE_SCAN"):
            self._ensure_scanner()
        # lazy contract: a hybrid engine whose workload never chose a
        # device mode scans on host here too — polish_contig on a small
        # input must not pay a scanner construction + filter upload
        if self._scanner is not None:  # hybrid: fused device scan
            bucket = max(256, 1 << (n - 1).bit_length())
            padded = np.zeros(bucket, np.uint8)
            padded[:n] = codes
            packed = np.asarray(self._scanner.scan_packed(padded, k))
            return np.unpackbits(
                packed.reshape(-1), bitorder="little"
            )[: n - k + 1].astype(bool)
        if self._jax is not None:
            bloom_jax, _ = self._jax
            import jax.numpy as jnp

            bucket = max(256, 1 << (n - 1).bit_length())
            padded = np.zeros(bucket, np.uint8)
            padded[:n] = codes
            self._codes_dev = jnp.asarray(padded)  # reused by eval calls
            packed = bloom_jax.probe_kmers_packed_jit(
                self._words, int(self.bf.bits), h, k, self._codes_dev
            )
            pres = np.unpackbits(np.asarray(packed), bitorder="little")
            return pres[: n - k + 1].astype(bool)
        try:
            from .. import native

            hashes = native.nthash_all(codes, k, h)
            return native.bf_contains(self.bf, hashes)
        except Exception:  # noqa: BLE001
            base = nt.canonical_hashes(codes, k)
            return self.bf.contains(nt.multi_hashes(base, k, h))

    def _eval_sites(self, codes: np.ndarray, sites: np.ndarray, n_combos: int):
        # device path only for chunked evaluations at the two standard tier
        # shapes (256-site tier-0 for mode 0, 64-site full-combo for modes
        # 1/2) -> at most two compiled programs; the rare mode-0 escalations
        # are single sites and stay on host
        if self._jax is not None and self._device_eval and len(sites) > 16:
            _, siteeval_jax = self._jax
            return siteeval_jax.eval_sites_jax(
                codes, sites, self._words, int(self.bf.bits), self.tables,
                self.cfg.h, n_combos, s_bucket=256,
                codes_dev=getattr(self, "_codes_dev", None),
            )
        try:
            from .. import native

            return native.eval_sites(
                codes, sites, self.bf, self.tables, self.cfg.h, n_combos,
                bail_edit=self.cfg.thr_edit, bail_del=self.cfg.thr_del,
                # modes 0/1 never read a candidate's ins supports past a
                # failed gate or an accepted sub; mode 2 reads them always
                skip_unused=self.cfg.mode in (0, 1),
            )
        except Exception:  # noqa: BLE001 — numpy fallback
            return siteeval.eval_sites_np(
                codes, sites, self.bf, self.tables, self.cfg.h, n_combos
            )

    def _masks(self, codes: np.ndarray, present: np.ndarray | None = None) -> ScanMasks:
        cfg = self.cfg
        k, n = cfg.k, len(codes)
        if present is None:
            present = self._probe_all(codes)
        nw = n - k + 1
        bad = ~_ACCEPTED_LUT[codes]
        badc = np.concatenate(([0], np.cumsum(bad)))
        window_clean = (badc[k:] - badc[:-k]) == 0  # [nw]
        w0 = find_first_accepted_kmer(0, bytearray(codes.tobytes()), k)
        visited = window_clean.copy()
        visited[: min(w0, nw)] = False
        # eligible: w <= n-2k and no bad char in [w+k, w+2k-1]
        eligible = np.zeros(nw, bool)
        lim = n - 2 * k
        if lim >= 0:
            eligible[: lim + 1] = window_clean[k : k + lim + 1]
        miss = ~present
        cm = np.zeros(nw, np.int32)
        missi = miss.astype(np.int32)
        for kk in range(0, k, cfg.jump):
            off = kk + 1  # cm[w] counts misses at windows w+1, w+1+j, ...
            if off < nw:
                cm[: nw - off] += missi[off:]
        cmf = cm.astype(np.float32)
        if cfg.use_ratio:
            thr = (np.float32(k) / np.float32(cfg.jump)) * np.float32(cfg.missing_ratio)
        else:
            thr = np.float32(k) / np.float32(cfg.missing_threshold)
        hot = visited & miss & eligible & (cmf >= thr)
        return ScanMasks(present=present, hot=hot, w0=w0)

    # -- phase B --------------------------------------------------------------
    def polish_many(self, seqs: list[bytes], processes: int = 0,
                    shard_bases: int = 1_000_000):
        """Polish a batch of contigs with shared device work.

        On the jax backend, the dense present[] probes of same-bucket
        contigs run as one [B, L] device call (the reference's process-level
        batch parallelism, SPMD-style); the sparse commit walks follow
        per contig.  Returns a list of (edited, records, editor) triples in
        input order.

        processes > 1 runs the commit walks in a fork pool (copy-on-write
        sharing of the Bloom filter and precomputed presents; workers use
        the numpy backend — they must not touch jax).  Contigs longer than
        shard_bases additionally split into independent slices at clean
        cut points (_find_cuts) so one giant contig still uses every core;
        reassembly is byte-exact.  The third triple element is then a
        lightweight EditStats instead of the editor object.

        On the hybrid backend the dense scans run through the lookahead
        device pipeline (polish/scanpipe.py): the chip scans chunk i+1
        while the host walks chunk i, removing the scan from the host's
        critical path entirely.  Placement is decided by A/B measurement:
        the first run of a (k, h) workload class goes to the device twice
        (the first bears XLA compiles), then once to the host, and the
        faster mode locks for the rest of the process — wall-clock of the
        real workload, not a microbenchmark proxy, decides.
        GPTPU_FORCE_DEVICE_SCAN=1 pins the device.
        """
        if self._scanner is not None or getattr(self, "_scanner_lazy", False):
            import os as _os
            import time as _time

            from ..ops import scan_conv as _sc

            total = sum(len(s) for s in seqs)
            probe = (
                self._scanner.probe if self._scanner is not None
                else _sc.probe_kind(int(self.bf.bits))
            )
            key = (
                self.cfg.k, self.cfg.h, probe,
                self.bf.bytes.bit_length(),       # filter-size bucket
                max(0, total.bit_length() - 1) // 2,  # grain bucket (4x)
            )
            ab = _AB_RUNS.setdefault(
                key, {"device": [], "host": [], "locked": None}
            )
            if _os.environ.get("GPTPU_FORCE_DEVICE_SCAN"):
                mode = "device"
            elif ab["locked"]:
                mode = ab["locked"]
            elif total < (3 << 17):
                # tiny batches never record samples (too noisy to measure)
                # and a host scan costs <15 ms — don't spend a device round
                # trip on them without evidence.  The gate sits below the
                # reference's ~512 Kbp batch grain so production-shaped
                # batches DO get measured.
                mode = "host"
            elif len(ab["device"]) < _AB_MIN_SAMPLES:
                mode = "device"
            elif len(ab["host"]) < _AB_MIN_SAMPLES:
                mode = "host"
            else:
                mode = "host"
            t0 = _time.monotonic()
            if mode == "device":
                res = self._polish_many_pipelined(seqs, processes, shard_bases)
            else:
                res = self._polish_many_std(seqs, processes, shard_bases)
            if total >= (3 << 17) and not ab["locked"]:
                samples = ab[mode]
                samples.append(total / max(_time.monotonic() - t0, 1e-9))
                del samples[:-_AB_KEEP]
                if (
                    len(ab["device"]) >= _AB_MIN_SAMPLES
                    and len(ab["host"]) >= _AB_MIN_SAMPLES
                ):
                    # best-of the samples decides (this box's neighbor noise
                    # swings 2x between identical runs; noise only ever
                    # slows an arm, so max is the robust estimator)
                    ab["locked"] = (
                        "device" if max(ab["device"]) >= max(ab["host"])
                        else "host"
                    )
            return res
        return self._polish_many_std(seqs, processes, shard_bases)

    def _polish_many_std(self, seqs: list[bytes], processes: int,
                         shard_bases: int):
        """Host-scan polish_many (and the jax device-eval backend's path)."""
        presents: dict[int, np.ndarray] = {}
        if self._jax is not None and len(seqs) > 1:
            import jax.numpy as jnp

            bloom_jax, _ = self._jax
            k, h = self.cfg.k, self.cfg.h
            buckets: dict[int, list[int]] = {}
            for i, s in enumerate(seqs):
                if len(s) >= k:
                    buckets.setdefault(
                        max(256, 1 << (len(s) - 1).bit_length()), []
                    ).append(i)
            for bucket, idxs in buckets.items():
                padded = np.zeros((len(idxs), bucket), np.uint8)
                for row, i in enumerate(idxs):
                    padded[row, : len(seqs[i])] = np.frombuffer(seqs[i], np.uint8)
                packed = np.asarray(
                    bloom_jax.probe_kmers_packed_jit(
                        self._words, int(self.bf.bits), h, k, jnp.asarray(padded)
                    )
                )
                pres = np.unpackbits(
                    packed.reshape(len(idxs), -1), axis=1, bitorder="little"
                )
                for row, i in enumerate(idxs):
                    presents[i] = pres[row, : len(seqs[i]) - k + 1].astype(bool)
        if processes > 1:
            k = self.cfg.k
            # work items: whole contigs, plus slices of contigs long enough
            # to shard (cut points sit mid-clean-run; see _find_cuts).
            # When no presence bits exist yet (pure-host path), cuts come
            # from SPARSE on-demand probes (_find_cuts_probe) and each
            # worker self-scans its piece — pre-scanning whole contigs in
            # the parent serialized the dense scan and capped the pool at
            # ~1x on clean data (the walk is cheap when few sites fire).
            items: list[tuple[int, int, bytes, np.ndarray | None]] = []
            for i, s in enumerate(seqs):
                pieces = min(processes, max(1, -(-len(s) // shard_bases)))
                if pieces > 1:
                    pres = presents.get(i)
                    if pres is not None:
                        cuts = _find_cuts(pres, k, len(s), pieces)
                    elif len(s) >= k:
                        cuts = self._find_cuts_probe(s, pieces)
                    else:
                        cuts = []
                    bounds = [0, *cuts, len(s)]
                    for a, b in zip(bounds[:-1], bounds[1:]):
                        items.append(
                            (i, a, s[a:b],
                             None if pres is None else pres[a : b - k + 1])
                        )
                else:
                    items.append((i, 0, s, presents.get(i)))
            if len(items) > 1:
                from ..utils.procs import get_pool

                ex = get_pool(processes)
                blob = self._cfg_blob()
                bf_ref = self._bf_ref()
                flags = self._env_flags()
                futs = []
                for _ci, _start, s, pres in items:
                    packed = (
                        np.packbits(pres, bitorder="little")
                        if pres is not None else None
                    )
                    futs.append(ex.submit(
                        _pm_task, blob, bf_ref, flags, s, packed,
                        0 if pres is None else len(pres),
                    ))
                pieces_out = [f.result() for f in futs]
                # reassemble slices (in order) back into contigs
                results: list = []
                for i in range(len(seqs)):
                    mine = [
                        (it, out) for it, out in zip(items, pieces_out)
                        if it[0] == i
                    ]
                    out_b = b"".join(o[0] for _it, o in mine)
                    recs: list[dict] = []
                    stats = EditStats(0, 0, 0, 0)
                    for (_ci, start, _s, _p), (_o, r, st) in mine:
                        for rec in r:
                            rec = dict(rec)
                            rec["pos"] += start
                            recs.append(rec)
                        stats = EditStats(
                            stats.n_subs + st.n_subs,
                            stats.n_ins + st.n_ins,
                            stats.n_dels + st.n_dels,
                            stats.n_masked + st.n_masked,
                            stats.n_table_hits + st.n_table_hits,
                            stats.n_table_giveups + st.n_table_giveups,
                        )
                    results.append((out_b, recs, stats))
                return results
        return [
            self.polish_contig(s, present=presents.get(i))
            for i, s in enumerate(seqs)
        ]

    def _polish_many_pipelined(self, seqs: list[bytes], processes: int,
                               shard_bases: int):
        """Hybrid-backend polish_many: device scan pipeline + host walks.

        The ScanPipe generator keeps `depth` chunk scans in flight on the
        device; each contig's walk (inline, or in the fork pool) runs while
        later contigs' scans proceed — pipeline throughput is
        max(walk, device scan) instead of host_scan + walk.
        """
        from .scanpipe import ScanPipe

        self._ensure_scanner()

        k = self.cfg.k
        if processes > 1 and (
            len(seqs) > 1 or any(len(s) > shard_bases for s in seqs)
        ):
            from ..utils.procs import get_pool

            # persistent pool: its workers were forked at first creation
            # (utils/procs.get_pool), never mid-device-dispatch
            ex = get_pool(processes)
            blob = self._cfg_blob()
            bf_ref = self._bf_ref()
            flags = self._env_flags()
            # seeded hybrid split: the first contigs go to the pool
            # IMMEDIATELY as scan+walk tasks (native in-worker scan), so no
            # worker idles during the device pipeline's first-call latency
            # and the host absorbs the share of scans the device cannot
            # deliver in time (measured best near 3/8 of the jobs on the
            # tunneled chip; at least one per worker).
            n_seed = min(
                max(processes, round(len(seqs) * 3 / 8)),
                max(0, len(seqs) - 1),
            )
            seed_ids = list(range(n_seed))
            jobs = [
                (i, np.frombuffer(s, np.uint8))
                for i, s in enumerate(seqs) if i >= n_seed
            ]
            eval_mode = getattr(self._scanner, "eval_enabled", False)
            pipe = ScanPipe(
                self._scanner, k, rows=self._scanner.preferred_rows,
                # smaller calls in eval mode: the per-call site budget
                # (s_max) must cover the call's error clusters
                row_windows=(1 << 18) if eval_mode else None,
            )
            pieces_map: dict[int, list] = {}

            def slice_tabs(tabs, a: int, piece_nw: int):
                """Site-table rows for piece windows [a, a+piece_nw)."""
                if tabs is None or not len(tabs[0]):
                    return None
                w = tabs[0]
                lo = int(np.searchsorted(w, a))
                hi = int(np.searchsorted(w, a + piece_nw))
                if hi <= lo:
                    return None
                return ((w[lo:hi] - a),) + tuple(t[lo:hi] for t in tabs[1:])

            def submit(ci: int, present: np.ndarray | None, tabs=None):
                s = seqs[ci]
                pieces = min(processes, max(1, -(-len(s) // shard_bases)))
                cuts = []
                if pieces > 1:
                    pres = present
                    if pres is None and len(s) >= k:
                        pres = self._present_host(
                            np.frombuffer(s, np.uint8)
                        )
                    if pres is not None and len(pres):
                        cuts = _find_cuts(pres, k, len(s), pieces)
                    present = pres
                bounds = [0, *cuts, len(s)]
                plist = []
                for a, b in zip(bounds[:-1], bounds[1:]):
                    sub = s[a:b]
                    if (present is not None and len(present)
                            and len(sub) >= k):
                        pres_sub = present[a : b - k + 1]
                        packed = np.packbits(pres_sub, bitorder="little")
                        nw = len(pres_sub)
                        ptabs = slice_tabs(tabs, a, nw)
                    else:
                        packed, nw, ptabs = None, 0, None
                    plist.append((a, ex.submit(
                        _pm_task, blob, bf_ref, flags, sub, packed, nw,
                        ptabs,
                    )))
                pieces_map[ci] = plist

            for ci in seed_ids:
                submit(ci, None)
            for item in pipe.run(jobs):
                ci, present = item[0], item[1]
                submit(ci, present if len(present) else None,
                       item[2] if eval_mode else None)
            results: list = []
            for ci in range(len(seqs)):
                out_b = b""
                recs: list[dict] = []
                stats = EditStats(0, 0, 0, 0)
                for start, fut in pieces_map[ci]:
                    o, r, st = fut.result()
                    out_b += o
                    for rec in r:
                        rec = dict(rec)
                        rec["pos"] += start
                        recs.append(rec)
                    stats = EditStats(
                        stats.n_subs + st.n_subs,
                        stats.n_ins + st.n_ins,
                        stats.n_dels + st.n_dels,
                        stats.n_masked + st.n_masked,
                        stats.n_table_hits + st.n_table_hits,
                        stats.n_table_giveups + st.n_table_giveups,
                    )
                results.append((out_b, recs, stats))
            return results
        # serial: inline walks; the pipe scans ahead on the device while the
        # parent walks.  The first contig self-scans (host native) so the
        # walk starts immediately — by the time it finishes, the device has
        # the next presents ready.
        n_seed = 1 if len(seqs) > 1 else 0
        jobs = [
            (i, np.frombuffer(s, np.uint8))
            for i, s in enumerate(seqs) if i >= n_seed
        ]
        eval_mode = getattr(self._scanner, "eval_enabled", False)
        pipe = ScanPipe(
            self._scanner, k, rows=self._scanner.preferred_rows,
            row_windows=(1 << 18) if eval_mode else None,
        )
        gen = pipe.run(jobs)
        out: list = [
            self.polish_contig(seqs[i]) for i in range(n_seed)
        ]
        for item in gen:
            ci, present = item[0], item[1]
            out.append(
                self.polish_contig(
                    seqs[ci], present=present if len(present) else None,
                    site_tables=item[2] if eval_mode else None,
                )
            )
        return out

    def polish_contig(self, seq_in: bytes, present: np.ndarray | None = None,
                      site_tables=None):
        """Polish one contig; returns (edited_bytes, subs_records, editor).

        site_tables: optional fused phase-A trial tables (ops/scan_eval,
        window-relative to seq_in) — consumed by the native walk only."""
        cfg = self.cfg
        k = cfg.k
        n = len(seq_in)
        if n >= cfg.min_contig_len and n >= k and self._use_native_walk():
            from .. import native

            return native.polish_contig(
                seq_in, self.bf, cfg, self.tables, present=present,
                site_tables=site_tables,
            )
        if cfg.snv:
            # SNV treats EVERY window as a hot site (reference
            # ntedit.cpp:1540-1556) — there is nothing for the two-phase
            # fast-forward to skip; the native walk is the batched path and
            # the oracle the fallback
            return orc.polish_contig(seq_in, self.bf, cfg)
        ed = orc._Editor(cfg, self.bf)
        if n < cfg.min_contig_len or n < k:
            return bytes(seq_in), [], ed
        codes = np.frombuffer(seq_in, np.uint8)
        if present is not None and self._jax is not None:
            # eval calls still need the contig codes on device
            import jax.numpy as jnp

            bucket = max(256, 1 << (n - 1).bit_length())
            padded = np.zeros(bucket, np.uint8)
            padded[:n] = codes
            self._codes_dev = jnp.asarray(padded)
        masks = self._masks(codes, present)
        hot_list = np.nonzero(masks.hot)[0]

        seq = bytearray(seq_in)
        new_seq = [Node(0, 0, n - 1, 0, 0)]
        recs: list[dict] = []
        ed.dirty_end = -1

        if masks.w0 + k - 1 >= n:
            return bytes(seq_in), [], ed
        if len(hot_list) == 0:
            return bytes(seq_in), [], ed

        # Lazy visited-prediction batching.  Errors produce *clusters* of hot
        # windows, and which cluster members the walker visits depends on the
        # decisions it makes: an accepted edit's dirty-zone segment scan
        # consumes the rest of its cluster (only the FIRST site of each
        # cluster is visited), while a mask/no-edit decision steps to the
        # IMMEDIATE next hot window (every cluster site is visited — the
        # unfixable-cluster regime that dominates real noisy batches).
        # Batching either pattern alone is ~12x wasteful in the other regime,
        # so the batch builder is adaptive: requests arriving after an
        # accepted edit predict the visited subset as hot sites spaced
        # >= k apart (next-cluster-first), requests arriving after a
        # no-edit decision batch consecutively.  A prediction miss just
        # starts a fresh batch at the missed site — correctness never
        # depends on the prediction.
        # Tier choice by mode: mode 0 stops at the first accepted indel, so
        # short combos (tier 0) resolve almost every site and the rare rest
        # escalate; modes 1/2 always scan all 341 combos.
        if cfg.mode == 0:
            batch_n, tier_combos = 64, TIER0_COMBOS
        else:
            batch_n = 256 if self._jax is not None else 64
            tier_combos = self.tables.n_combos
        site_cache: dict[int, tuple[siteeval.SiteSupports, int]] = {}

        def sup_for(si: int, consecutive: bool) -> tuple[siteeval.SiteSupports, int]:
            # Supports are computed on pure-draft content, which stays valid
            # downstream of every edit kind (subs/masks only rewrite bytes
            # inside their dirty zone, whose hot sites the scalar segment
            # scan consumes; indels shift the rope, not the draft).
            if si not in site_cache:
                if consecutive:
                    sel = list(range(si, min(si + batch_n, len(hot_list))))
                else:
                    sel = [si]
                    last = int(hot_list[si])
                    j = si + 1
                    while j < len(hot_list) and len(sel) < batch_n:
                        w = int(hot_list[j])
                        if w >= last + k:
                            sel.append(j)
                            last = w
                        j += 1
                sup = self._eval_sites(codes, hot_list[sel], tier_combos)
                for row, idx in enumerate(sel):
                    site_cache[idx] = (sup, row)
            return site_cache[si]

        full_sup_cache: dict[int, siteeval.SiteSupports] = {}

        cur_w = masks.w0
        trailing = 0  # rope index of the trailing pure-draft position node
        hot_pos = 0
        consec_hint = False  # last decision was mask/no-edit -> cluster walk
        while True:
            # FAST mode: jump to the next hot site at/after cur_w
            while hot_pos < len(hot_list) and hot_list[hot_pos] < cur_w:
                hot_pos += 1
            if hot_pos >= len(hot_list):
                break
            si = hot_pos
            w_h = int(hot_list[si])
            hot_pos += 1
            if w_h + k - 1 >= n:
                break
            # reseed the exact scan state at this pure-draft window
            st = {"h": w_h, "t": w_h + k - 1, "hn": trailing, "tn": trailing}
            fh, rh = _seed(seq, w_h, k)
            char_in = seq[st["t"]]
            draft_char = _upper(char_in)
            mode2 = cfg.mode == 2
            sup, local_si = sup_for(si, consec_hint)
            provider = _TableProvider(sup, local_si, seq, st["t"], mode2)
            try:
                best = _engine_run_trials(cfg, draft_char, provider)
            except NeedMoreCombos:
                if w_h not in full_sup_cache:
                    full_sup_cache[w_h] = self._eval_sites(
                        codes, np.array([w_h], np.int64), self.tables.n_combos
                    )
                provider = _TableProvider(full_sup_cache[w_h], 0, seq, st["t"], mode2)
                best = _engine_run_trials(cfg, draft_char, provider)
            if provider.applied_sub and seq[st["t"]] != draft_char:
                # reference side effect: the sub-trial revert writes the
                # *uppercased* draft char back (ntedit.cpp:1610)
                seq[st["t"]] = draft_char
                char_in = draft_char
            if best["edit_type"] == 0:
                consec_hint = True
                if cfg.mask:
                    # soft-mask (-a1) lowercases one byte — a case-only write
                    # that leaves every hash unchanged (seedTab indexes c&7),
                    # so the precomputed present/hot/support tables stay
                    # valid and the walk stays in FAST mode.  Unfixable
                    # clusters would otherwise run the scalar segment scan
                    # site by site (the dominant cost on noisy regions).
                    fh, rh, char_in = ed._make_edit(
                        draft_char, best, recs, st, fh, rh, seq, new_seq,
                        char_in,
                    )
                cur_w = w_h + 1
                continue
            consec_hint = False
            fh, rh, char_in = ed._make_edit(
                draft_char, best, recs, st, fh, rh, seq, new_seq, char_in
            )
            # SEGMENT mode: exact scalar scan through the dirty zone
            def _exit_clean(s):
                node = new_seq[s["hn"]]
                return (
                    s["h"] > ed.dirty_end
                    and s["hn"] == s["tn"]
                    and node.node_type == 0
                    and node.e_pos == n - 1
                )

            status, st, fh, rh, char_in = ed.scan_from(
                st, fh, rh, char_in, seq, new_seq, recs,
                exit_check=_exit_clean, start_with_roll=True,
            )
            if status == "end":
                break
            cur_w = st["h"]
            trailing = st["hn"]

        return ed._render(seq, new_seq), recs, ed


def polish_contig_tpu(seq: bytes, bf, cfg: Config, backend: str = "numpy"):
    """One-shot convenience wrapper."""
    return NtEditTPU(cfg, bf, backend=backend).polish_contig(seq)
