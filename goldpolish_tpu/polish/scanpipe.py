"""Chunked, lookahead-pipelined device presence scans.

The dense detection scan (a Bloom probe of every draft window) runs on the
TPU as a sequence of fixed-shape chunk programs (ops/scan_conv fused
hash+probe), dispatched ASYNCHRONOUSLY ahead of the consumer: while the
host walks the hot sites of chunk i (the sparse, branchy phase B that
fundamentally belongs on the CPU), the device is already scanning chunks
i+1..i+depth.  On a chip behind a slow link this is the difference between
the TPU being decorative and the TPU removing the entire dense scan from
the host's critical path: pipeline throughput = max(walk, device-scan)
instead of host-scan + walk.

Chunking is window-exact: a chunk covering windows [a, b) of a contig reads
bytes [a, b+k-1), so presence bits stitch back byte-identically to a whole-
contig scan (each window hash only reads its own k bytes — there is no
cross-window state; see ops/scan_conv).  Full chunks share one static shape
(one XLA program); tail chunks pad to a power-of-two bucket (a handful of
shapes total).

Replaces the reference's one-rolling-probe-per-position inner loop
(reference: subprojects/ntedit/ntedit.cpp:1414-1486) as the production
device scan.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

CHUNK_WINDOWS = 1 << 21  # 2 M windows per device program
MIN_TAIL = 256
DEPTH = 3  # chunks in flight (1 being consumed + lookahead)


@dataclass
class _Chunk:
    job: int
    w0: int  # first window covered
    nw: int  # valid windows


class ScanPipe:
    """Runs fused device scans for a stream of byte-code jobs with lookahead.

    jobs: list of (job_id, codes uint8[n]).  `run()` yields
    (job_id, present bool[n-k+1]) in input order while later chunks scan on
    the device in the background.
    """

    def __init__(self, scanner, k: int, chunk_windows: int = CHUNK_WINDOWS,
                 depth: int = DEPTH):
        self.scanner = scanner
        self.k = k
        self.chunk_windows = int(chunk_windows)
        self.depth = max(1, int(depth))

    def _chunks_of(self, codes: np.ndarray) -> list[_Chunk]:
        nw = len(codes) - self.k + 1
        return [
            _Chunk(0, a, min(self.chunk_windows, nw - a))
            for a in range(0, max(nw, 1), self.chunk_windows)
            if nw > 0
        ]

    def _dispatch(self, codes: np.ndarray, ch: _Chunk):
        k = self.k
        n_bytes = ch.nw + k - 1
        if ch.nw == self.chunk_windows:
            buf_len = self.chunk_windows + k - 1  # the one hot shape
        else:
            buf_len = MIN_TAIL
            while buf_len < n_bytes:
                buf_len *= 2
        buf = np.zeros(buf_len, np.uint8)
        buf[:n_bytes] = codes[ch.w0 : ch.w0 + n_bytes]
        return self.scanner.scan_packed(buf, k)

    def run(self, jobs):
        """Generator of (job_id, present) in input order."""
        k = self.k
        plan: list[tuple[int, np.ndarray, _Chunk]] = []
        for ji, (job_id, codes) in enumerate(jobs):
            for ch in self._chunks_of(codes):
                ch.job = ji
                plan.append((job_id, codes, ch))
        # degenerate jobs (shorter than k) still yield
        short = {ji: job_id for ji, (job_id, codes) in enumerate(jobs)
                 if len(codes) < k}

        inflight: deque = deque()
        pos = 0

        def pump():
            nonlocal pos
            while pos < len(plan) and len(inflight) < self.depth:
                job_id, codes, ch = plan[pos]
                inflight.append((job_id, ch, self._dispatch(codes, ch)))
                pos += 1

        pump()
        for ji, (job_id, codes) in enumerate(jobs):
            if ji in short:
                yield job_id, np.zeros(0, bool)
                continue
            nw = len(codes) - k + 1
            parts: list[np.ndarray] = []
            got = 0
            while got < nw:
                _jid, ch, fut = inflight.popleft()
                pump()  # keep the device busy before blocking on this chunk
                packed = np.asarray(fut)  # blocks for THIS chunk only
                pres = np.unpackbits(
                    packed.reshape(-1), bitorder="little"
                )[: ch.nw].astype(bool)
                parts.append(pres)
                got += ch.nw
            yield job_id, (parts[0] if len(parts) == 1 else np.concatenate(parts))
