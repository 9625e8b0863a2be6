"""Device de Bruijn BFS kernel (ops/dbg_bfs) parity vs the host search.

Two layers: (1) the kernel's reachable-vertex mask dictionaries equal a
reference host BFS over konnector.DBG; (2) connect_pairs_batch_masks (mask
replay) produces SearchResults identical to the probing host path on a
sealer-shaped gap scenario, and seal_records(backend="hybrid") output is
byte-identical to the host backend.
"""

import pytest

from collections import deque

import numpy as np

from goldpolish_tpu.fill.konnector import (
    DBG, ConnectPairsParams, connect_pairs_batch, connect_pairs_batch_masks,
)
from goldpolish_tpu.fill import sealer as sl
from goldpolish_tpu.ops import bloom, nthash as nt
from goldpolish_tpu.ops.dbg_bfs import DeviceBFS, pack_kmer, unpack_kmer

K, H = 24, 4


def _genome_bf(n=20_000, seed=2):
    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 16, H, K)
    codes = np.frombuffer(truth, np.uint8)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, K), K, H))
    return truth.decode(), bf


def _ref_masks(dbg: DBG, seed_kmer: str, max_depth: int, forward: bool):
    """Reference host BFS: every vertex reachable within max_depth and its
    4-bit extension mask (mask computed for every visited vertex, children
    followed only below the cap).  Keys are PACKED k-mers — the kernel's
    (and the host replay's) vertex type."""
    masks = {}
    depth = {seed_kmer: 0}
    q = deque([seed_kmer])
    while q:
        u = q.popleft()
        nbrs = dbg.successors(u) if forward else dbg.predecessors(u)
        m = 0
        for v in nbrs:
            b = v[-1] if forward else v[0]
            m |= 1 << "ACGT".index(b)
        masks[pack_kmer(u)] = m
        if depth[u] < max_depth:
            for v in nbrs:
                if v not in depth:
                    depth[v] = depth[u] + 1
                    q.append(v)
    return masks


def test_pack_roundtrip():
    for s in ("ACGT" * 6, "TTTTTTTTTTTTTTTTTTTTTTTT", "GATTACAGATTACAGATTACAGAT"):
        assert unpack_kmer(pack_kmer(s), K) == s


def test_kernel_masks_match_reference():
    truth, bf = _genome_bf()
    dbg = DBG(bf, K)
    dev = DeviceBFS(bf, K, w_cap=128, v_cap=1024, batch=4)
    searches = []
    refs = []
    for off, md_f, md_r in ((500, 12, 10), (3000, 20, 20), (7777, 6, 18)):
        start = truth[off : off + K]
        goal = truth[off + 40 : off + 40 + K]
        searches.append((start, goal, md_f, md_r))
        refs.append((
            _ref_masks(dbg, start, md_f, True),
            _ref_masks(dbg, goal, md_r, False),
        ))
    out = dev.run(searches)
    assert len(out) == len(searches)
    for (succ, pred), (ref_s, ref_p) in zip(out, refs):
        assert succ is not None, "unexpected overflow"
        assert succ == ref_s
        assert pred == ref_p


def test_kernel_overflow_flags():
    truth, bf = _genome_bf()
    # saturate: every extension "exists" -> frontier quadruples per level
    bf2 = bloom.BloomFilter(1 << 10, H, K)
    bf2.array[:] = 0xFF
    dev = DeviceBFS(bf2, K, w_cap=32, v_cap=128, batch=2)
    start = truth[100 : 100 + K]
    goal = truth[200 : 200 + K]
    out = dev.run([(start, goal, 30, 30)])
    assert out[0] == (None, None)


def _gap_scenario(n=40_000, seed=9, n_gaps=6):
    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 17, H, K)
    codes = np.frombuffer(truth, np.uint8)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, K), K, H))
    pairs = []
    flank = 100
    for i in range(n_gaps):
        p = 2000 + i * 5000
        gap = 40 + 17 * i
        read1 = truth[p - flank : p].decode()
        from goldpolish_tpu.fill.konnector import revcomp

        read2 = revcomp(truth[p + gap : p + gap + flank].decode())
        pairs.append((read1, read2))
    return truth, bf, pairs


def test_mask_replay_equals_probing_search():
    truth, bf, pairs = _gap_scenario()
    dbg = DBG(bf, K)
    params = ConnectPairsParams(
        max_merged_seq_len=400, max_paths=10, max_branches=1000,
        max_cost=100_000,
    )
    want = connect_pairs_batch(dbg, pairs, params)
    dev = DeviceBFS(bf, K, batch=4)
    got = connect_pairs_batch_masks(dbg, pairs, params, dev)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.path_result == w.path_result
        assert g.cost == w.cost
        assert g.num_nodes_visited == w.num_nodes_visited
        assert g.max_active_branches == w.max_active_branches
        assert g.merged_seqs == w.merged_seqs
        assert g.consensus == w.consensus
        assert g.read_mismatches == w.read_mismatches
    assert sum(1 for w in want if w.path_result == "FOUND_PATH") >= 4


@pytest.mark.slow
def test_seal_records_hybrid_byte_identical():
    rng = np.random.default_rng(31)
    n = 30_000
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    ks = [24, 20]
    bfs_by_k = {}
    for k in ks:
        bf = bloom.BloomFilter(1 << 17, H, k)
        codes = np.frombuffer(truth, np.uint8)
        bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, k), k, H))
        bfs_by_k[k] = bf
    # mask a few runs (sealer --lower finds lowercase gaps)
    seq = bytearray(truth)
    for p in (4000, 11_000, 19_000):
        seq[p : p + 50] = truth[p : p + 50].lower()
    records = [("ctg1 test", bytes(seq).decode())]
    cfg = sl.SealerConfig(k_values=ks)
    out_host, stats_host = sl.seal_records(records, bfs_by_k, cfg)
    out_dev, stats_dev = sl.seal_records(
        records, bfs_by_k, cfg, backend="hybrid"
    )
    assert out_dev == out_host
    assert stats_dev == stats_host
    assert stats_host["gaps_closed"] >= 1
