"""Read->contig mapping store: ntLink TSV / PAF / SAM parsing + filtering.

Semantics mirror the reference AllMappings (reference: src/mappings.{hpp,cpp}):

 * ntLink 3-column TSV (read_id, contig_id, minimizer_count); rows below
   mx_threshold_min are dropped at load (reference mappings.cpp:94-99),
 * PAF (query col 1 -> read, target col 6 -> contig) and SAM (QNAME/RNAME,
   '@' headers skipped) load with mx=0 and no further filtering
   (reference :112-215),
 * duplicates (same read mapped to same contig again) keep the first row
   (reference :65-70),
 * mappings to contigs absent from the target index are dropped (reference :43),
 * the ntLink path then runs the adaptive minimizer-threshold filter: per
   contig, pick the smallest threshold in [mx_min, mx_max] such that the
   retained read count is <= ceil(len * mx_per_10kbp / 10000), by binary
   search (reference :230-320).
"""

from __future__ import annotations

import math

MX_THRESHOLD_MIN = 1
MX_THRESHOLD_MAX = 30  # reference: src/goldpolish_targeted_bfs.cpp:34-35


class AllMappings:
    def __init__(self):
        # contig_id -> list of read ids (insertion order preserved)
        self._mappings: dict[str, list[str]] = {}
        self._mx: dict[str, list[int]] = {}
        self._inserted: dict[str, set[str]] = {}

    # -- loading --------------------------------------------------------------
    @classmethod
    def load(cls, filepath: str, target_index, mx_threshold_min: int = MX_THRESHOLD_MIN,
             mx_threshold_max: int = MX_THRESHOLD_MAX,
             mx_max_mapped_seqs_per_target_10kbp: float = 150.0) -> "AllMappings":
        m = cls()
        if filepath.endswith((".sam", ".bam")):
            m._load_sam(filepath, target_index)
        elif filepath.endswith(".paf"):
            m._load_paf(filepath, target_index)
        else:
            m._load_ntlink(filepath, target_index, mx_threshold_min)
            m.filter(
                mx_max_mapped_seqs_per_target_10kbp,
                mx_threshold_min,
                mx_threshold_max,
                target_index,
            )
        m._inserted.clear()
        return m

    def _add(self, read_id: str, contig_id: str, target_index, mx: int) -> None:
        if not target_index.seq_exists(contig_id):
            return
        ins = self._inserted.setdefault(contig_id, set())
        if read_id in ins:
            return
        ins.add(read_id)
        self._mappings.setdefault(contig_id, []).append(read_id)
        self._mx.setdefault(contig_id, []).append(mx)

    def _load_ntlink(self, filepath, target_index, mx_threshold_min):
        with open(filepath) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                read_id, contig_id, mx_s = parts[0], parts[1], parts[2]
                mx = int(mx_s)
                if mx >= mx_threshold_min:
                    self._add(read_id, contig_id, target_index, mx)

    def _load_paf(self, filepath, target_index):
        with open(filepath) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                parts = line.split()
                if len(parts) < 6:
                    continue
                self._add(parts[0], parts[5], target_index, 0)

    def _load_sam(self, filepath, target_index):
        with open(filepath) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                parts = line.split()
                if len(parts) < 3:
                    continue
                self._add(parts[0], parts[2], target_index, 0)

    # -- adaptive minimizer filter (reference mappings.cpp:230-320) -----------
    def filter(self, max_per_10kbp: float, mx_min: int, mx_max: int, target_index):
        if max_per_10kbp <= 0:
            raise ValueError("max_mapped_seqs_per_target_10kbp must be positive")
        if mx_min >= mx_max:
            raise ValueError("mx_threshold_min must be < mx_threshold_max")
        for contig_id in list(self._mappings):
            mappings = self._mappings[contig_id]
            if not mappings:
                continue
            mx = self._mx[contig_id]
            if not target_index.seq_exists(contig_id):
                continue
            length = target_index.get_seq_len(contig_id)
            max_mapped = math.ceil(length * max_per_10kbp / 10_000.0)

            def count_at(th):
                return sum(1 for v in mx if v >= th)

            lo, lo_n = mx_min, len(mappings)
            hi, hi_n = mx_max, count_at(mx_max)
            if lo_n <= max_mapped:
                threshold = lo
            elif hi_n > max_mapped:
                threshold = hi
            else:
                while hi - lo > 1:
                    mid = (hi + lo) // 2
                    mid_n = count_at(mid)
                    if mid_n > max_mapped:
                        lo, lo_n = mid, mid_n
                    else:
                        hi, hi_n = mid, mid_n
                threshold = hi
            self._mappings[contig_id] = [
                r for r, v in zip(mappings, mx) if v >= threshold
            ]

    # -- queries --------------------------------------------------------------
    def get_mappings(self, contig_id: str) -> list[str]:
        return self._mappings.get(contig_id, [])

    def contigs(self):
        return self._mappings.keys()

    def __len__(self):
        return len(self._mappings)
