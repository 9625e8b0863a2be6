"""Internal minimizer read->contig mapper (the ntLink role, in-process).

The reference shells out to ntLink or minimap2 for read->contig mappings
(reference: scripts/goldpolish-make:53-60) and then consumes only
(read_id, contig_id, shared-minimizer-count) triples
(reference: src/mappings.cpp:74-110).  This module produces those triples
directly:

 * both contigs and reads are sketched with (k, w) minimizers — a k-mer is
   a minimizer if its canonical ntHash is the minimum of any w-window of
   hashes (standard winnowing),
 * a read maps to a contig with count = number of the read's minimizer
   positions whose hash occurs in the contig's sketch,
 * output is the ntLink 3-column TSV AllMappings already parses, so the
   adaptive minimizer-threshold filter (mappings.py) applies unchanged.

The hash computation reuses the framework's ntHash kernels (native rolling
loop on host; the all-window device hashing path can supply the hashes on
TPU hosts).  Defaults follow ntLink's spirit (large w keeps sketches small
for long reads) but with the pipeline's own k.
"""

from __future__ import annotations

import numpy as np

from .ops import nthash as nt
from .utils.log import get_logger

log = get_logger("mapper")

DEFAULT_K = 24
DEFAULT_W = 100


def _window_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    try:
        from . import native

        return native.nthash_all(codes, k, 1)[:, 0]
    except Exception:  # noqa: BLE001
        return nt.canonical_hashes(codes, k)


def minimizer_sketch(seq: str | bytes, k: int = DEFAULT_K, w: int = DEFAULT_W):
    """(positions, hashes) of the (k, w)-minimizers of seq."""
    codes = nt.encode(seq) if isinstance(seq, str) else np.frombuffer(seq, np.uint8)
    n = len(codes)
    if n < k:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    h = _window_hashes(codes, k)
    nw = len(h)
    if nw <= w:
        pos = np.array([int(np.argmin(h))], np.int64)
        return pos, h[pos]
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = sw.min(axis=1)
    argm = sw.argmin(axis=1) + np.arange(nw - w + 1)
    pos = np.unique(argm)
    return pos.astype(np.int64), h[pos]


def map_reads(target_records, read_records, k: int = DEFAULT_K,
              w: int = DEFAULT_W, min_shared: int = 1):
    """Yield (read_id, contig_id, shared_minimizer_count) triples.

    target_records / read_records: iterables of (id, seq).
    """
    index: dict[int, list[str]] = {}
    n_contigs = 0
    for cid, seq in target_records:
        n_contigs += 1
        _, hashes = minimizer_sketch(seq, k, w)
        for hv in np.unique(hashes):
            index.setdefault(int(hv), []).append(cid)
    log.info("mapper: indexed %d contigs, %d distinct minimizers",
             n_contigs, len(index))
    for rid, seq in read_records:
        _, hashes = minimizer_sketch(seq, k, w)
        counts: dict[str, int] = {}
        for hv in hashes:
            for cid in index.get(int(hv), ()):
                counts[cid] = counts.get(cid, 0) + 1
        for cid, cnt in counts.items():
            if cnt >= min_shared:
                yield rid, cid, cnt


def write_mapping_tsv(target_fasta: str, reads_path: str, out_tsv: str,
                      k: int = DEFAULT_K, w: int = DEFAULT_W) -> int:
    """Map reads and write the ntLink-style 3-column TSV."""
    from .io import fasta

    targets = ((r.id, r.seq) for r in fasta.read_seqs(target_fasta))
    reads = ((r.id, r.seq) for r in fasta.read_seqs(reads_path))
    n = 0
    with open(out_tsv, "w") as f:
        for rid, cid, cnt in map_reads(targets, reads, k, w):
            f.write(f"{rid}\t{cid}\t{cnt}\n")
            n += 1
    log.info("mapper: wrote %d mappings -> %s", n, out_tsv)
    return n
