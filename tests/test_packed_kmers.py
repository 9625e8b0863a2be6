"""Packed-kmer vertex representation (ops/kmers + konnector.PackedDBG).

Pins: (1) codec bijectivity on ACGT, (2) PackedDBG adjacency == string DBG
adjacency (native gp_extend4p AND the pure-Python fallback), (3) the full
Konnector search gives IDENTICAL results on packed-int vertices and on the
string vertices they replace (the vertex type must be unobservable), and
(4) dirty anchors (N/IUPAC) take the string path and still work.
"""

import numpy as np
import pytest

from goldpolish_tpu.fill.konnector import (
    DBG, ConnectPairsParams, PackedDBG, connect_pairs_batch, revcomp,
)
from goldpolish_tpu.ops import bloom, nthash as nt
from goldpolish_tpu.ops import kmers as km

K, H = 25, 4


def _genome_bf(n=30_000, seed=5):
    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 17, H, K)
    codes = np.frombuffer(truth, np.uint8)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, K), K, H))
    return truth.decode(), bf


def test_codec_roundtrip_and_gate():
    for s in ("ACGT" * 8, "T" * 17, "GATTACA" * 4):
        assert km.unpack_kmer(km.pack_kmer(s), len(s)) == s
    assert km.is_packable("ACGTACGT")
    assert not km.is_packable("ACGTNCGT")
    assert not km.is_packable("acgtacgt")  # case matters for identity
    assert not km.is_packable("ACGRACGT")
    arr = km.unpack_many(np.array([km.pack_kmer("ACGTACGT")], np.uint64), 8)
    assert arr.tobytes() == b"ACGTACGT"


def test_packed_adjacency_matches_string_dbg():
    truth, bf = _genome_bf()
    dbg = DBG(bf, K)
    view = PackedDBG(dbg)
    fb = PackedDBG(dbg)
    fb._fn = None  # force the pure-Python fallback path
    for off in range(0, 5000, 37):
        kmer = truth[off : off + K]
        v = km.pack_kmer(kmer)
        want_s = dbg.successors(kmer)
        want_p = dbg.predecessors(kmer)
        for pv in (view, fb):
            assert [km.unpack_kmer(c, K) for c in pv.successors(v)] == want_s
            assert [km.unpack_kmer(c, K) for c in pv.predecessors(v)] == want_p


def _pairs(truth, n_gaps=8):
    pairs = []
    flank = 90
    for i in range(n_gaps):
        p = 1500 + i * 3200
        gap = 30 + 13 * i
        pairs.append((
            truth[p - flank : p],
            revcomp(truth[p + gap : p + gap + flank]),
        ))
    return pairs


def _result_tuple(r):
    return (
        r.path_result, r.cost, r.num_nodes_visited, r.max_active_branches,
        r.found_start, r.found_goal, r.start_kmer_pos, r.goal_kmer_pos,
        r.merged_seqs, r.consensus, r.read_mismatches, r.path_mismatches,
    )


def test_packed_search_identical_to_string_search(monkeypatch):
    truth, bf = _genome_bf()
    dbg = DBG(bf, K)
    params = ConnectPairsParams(
        max_merged_seq_len=400, max_paths=10, max_branches=1000,
        max_cost=100_000, mem_limit=500 * 1024 * 1024,
    )
    pairs = _pairs(truth)
    got = connect_pairs_batch(dbg, pairs, params)
    # force the string-vertex representation through the same entry point
    monkeypatch.setattr(km, "is_packable", lambda s: False)
    want = connect_pairs_batch(dbg, pairs, params)
    assert [_result_tuple(r) for r in got] == [_result_tuple(r) for r in want]
    assert sum(1 for r in got if r.path_result == "FOUND_PATH") >= 5


def test_dirty_anchor_takes_string_path():
    truth, bf = _genome_bf()
    dbg = DBG(bf, K)
    params = ConnectPairsParams(max_merged_seq_len=400, max_paths=10,
                                max_branches=1000, max_cost=100_000)
    pairs = _pairs(truth, n_gaps=2)
    # poison read1 so the chosen anchor window must contain the N: every
    # k-window of the left flank overlaps position -10 from the gap side
    r1 = pairs[0][0]
    dirty = r1[: len(r1) - 10] + "N" + r1[len(r1) - 9 :]
    from goldpolish_tpu.fill.konnector import _prepare_search

    _res, search = _prepare_search(dbg, dirty, pairs[0][1], params)
    if search is not None and "N" in search.start_str:
        assert not search.packed
        assert isinstance(search.start, str)
    # and the batch entry point completes without error on the dirty pair
    out = connect_pairs_batch(dbg, [(dirty, pairs[0][1])], params)
    assert len(out) == 1


def test_search_memlimit_representation_invariant(monkeypatch):
    """EXCEEDED_MEM_LIMIT must fire at the same point for both vertex
    representations (the mem model intentionally charges string-sized
    entries either way)."""
    truth, bf = _genome_bf()
    dbg = DBG(bf, K)
    params = ConnectPairsParams(
        max_merged_seq_len=400, max_paths=10, max_branches=1000,
        max_cost=100_000, mem_limit=40_000,  # tiny: force the abort
    )
    pairs = _pairs(truth)
    got = connect_pairs_batch(dbg, pairs, params)
    monkeypatch.setattr(km, "is_packable", lambda s: False)
    want = connect_pairs_batch(dbg, pairs, params)
    assert [_result_tuple(r) for r in got] == [_result_tuple(r) for r in want]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
