"""Sealer gap-fill + Konnector + NW consensus functional tests."""

import numpy as np
import pytest

from goldpolish_tpu.fill import konnector, nw, sealer
from goldpolish_tpu.ops import bloom, nthash as nt

K, H = 32, 4


def _bf_from(truth: str, k=K, bytes_size=1 << 17):
    bf = bloom.BloomFilter(bytes_size, H, k)
    base = nt.canonical_hashes(nt.encode(truth), k)
    bf.insert(nt.multi_hashes(base, k, H))
    return bf


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


# --- NW alignment ------------------------------------------------------------
def test_nw_identical():
    m, aln = nw.align_global("ACGTACGT", "ACGTACGT")
    assert m == 8 and aln["match_align"] == "ACGTACGT"


def test_nw_mismatch_makes_iupac_consensus():
    m, aln = nw.align_global("ACGA", "ACGT")
    # A|T -> W (ambiguityOr), scored as mismatch
    assert aln["match_align"] == "ACGW"
    assert m == 3


def test_nw_gap_is_lowercase():
    m, aln = nw.align_global("ACGTTT", "ACTTT")
    assert aln["match_align"].count("g") + aln["match_align"].count("c") >= 1
    assert len(aln["query_align"]) == len(aln["target_align"])


def test_nw_multi_consensus():
    matches, size, cons = nw.align_multi(["ACGTACGT", "ACGAACGT", "ACGTACGT"])
    assert size >= 8
    assert matches == 0  # reference quirk: min-from-zero for 3+ seqs


# --- Konnector primitives ----------------------------------------------------
def test_get_start_kmer_pos_prefers_gap_side():
    rng = np.random.default_rng(0)
    truth = _genome(rng, 300)
    bf = _bf_from(truth)
    dbg = konnector.DBG(bf, K)
    flank = truth[100:200]  # fully present
    pos = konnector.get_start_kmer_pos(dbg, flank, 3)
    # scanning right-to-left, the 3rd consecutive hit is at len-k-2
    assert pos == len(flank) - K - 2


def test_get_start_kmer_pos_no_match():
    rng = np.random.default_rng(1)
    bf = bloom.BloomFilter(1 << 14, H, K)  # empty
    dbg = konnector.DBG(bf, K)
    assert konnector.get_start_kmer_pos(dbg, _genome(rng, 100), 3) == konnector.NO_MATCH


def test_connect_pairs_bridges_gap():
    rng = np.random.default_rng(2)
    truth = _genome(rng, 500)
    bf = _bf_from(truth)
    dbg = konnector.DBG(bf, K)
    # flanks around a 50bp "gap" at [200, 250)
    left = truth[140:200]
    right_rc = konnector.revcomp(truth[250:310])
    res = konnector.connect_pairs(
        dbg, left, right_rc,
        konnector.ConnectPairsParams(
            max_merged_seq_len=800 + 2 * 32, max_paths=10,
            max_branches=1000, max_cost=100000,
        ),
    )
    assert res.path_result == "FOUND_PATH", res.path_result
    merged = res.merged_seqs[0] if len(res.merged_seqs) == 1 else res.consensus
    # the merged sequence must reconstruct the truth across the gap
    assert merged.upper() in truth


# --- Sealer end-to-end -------------------------------------------------------
def test_find_flanks_lower_mode():
    cfg = sealer.SealerConfig(flank_length=10)
    seq = "ACGTACGTACGT" + "acgtn" * 4 + "TTTTGGGGCCCC"
    fl = sealer.find_flanks("c1", seq, cfg)
    assert len(fl) == 1
    left, right, gap = fl[0]
    assert gap.gap_start == 12 and gap.gap_size == 20
    assert left == "ACGTACGTAC"[-10:].upper() or len(left) == 10
    assert len(right) == 10


def test_find_flanks_trailing_gap_skipped():
    cfg = sealer.SealerConfig(flank_length=5)
    fl = sealer.find_flanks("c1", "ACGTACGT" + "nnnn", cfg)
    assert fl == []


def test_seal_records_fills_masked_gap():
    rng = np.random.default_rng(3)
    truth = _genome(rng, 1200)
    ks = [32, 28]
    bfs = {k: _bf_from(truth, k=k) for k in ks}
    # draft with the middle soft-masked (as ntEdit -a1 would produce)
    draft = truth[:500] + truth[500:560].lower() + truth[560:]
    cfg = sealer.SealerConfig(k_values=ks, flank_length=32, verbose=False)
    out, stats = sealer.seal_records([("ctg1 c", draft)], bfs, cfg)
    assert stats["gaps_found"] == 1
    assert stats["gaps_closed"] >= 1
    header, sealed = out[0]
    assert header == "ctg1 c"
    assert sealed.upper() == truth  # gap restored
    # the filled region is uppercase (flank overlay + path)
    assert sealed[500:560].upper() == truth[500:560]


def test_seal_counter_struct_parity():
    """Per-k counter reports carry all 15 reference Counters fields
    (sealer.cpp:229-245), including the three konnector-heritage fields
    the reference zeroes per k but never increments (:603-605)."""
    rng = np.random.default_rng(3)
    truth = _genome(rng, 1200)
    ks = [32, 28]
    bfs = {k: _bf_from(truth, k=k) for k in ks}
    draft = truth[:500] + truth[500:560].lower() + truth[560:]
    cfg = sealer.SealerConfig(k_values=ks, flank_length=32)
    _, stats = sealer.seal_records([("ctg1", draft)], bfs, cfg)
    assert len(sealer.COUNTER_NAMES) == 15
    for k in ks:
        assert set(stats[k]) == set(sealer.COUNTER_NAMES)
        for name in ("traversalMemExceeded", "readPairsProcessed",
                     "readPairsMerged"):
            assert stats[k][name] == 0


def test_seal_records_unclosable_gap_left_alone():
    rng = np.random.default_rng(4)
    truth = _genome(rng, 600)
    other = _genome(rng, 600)
    bfs = {32: _bf_from(other)}  # BF from unrelated genome
    draft = truth[:300] + truth[300:330].lower() + truth[330:]
    cfg = sealer.SealerConfig(k_values=[32], flank_length=32)
    out, stats = sealer.seal_records([("c1", draft)], bfs, cfg)
    assert stats["gaps_closed"] == 0
    assert out[0][1] == draft
    assert sum(stats[32].values()) >= 1


def test_seal_n_gap_plain_mode():
    """Hard N gaps sealed in --lower mode too (N is a gap char)."""
    rng = np.random.default_rng(5)
    truth = _genome(rng, 800)
    bfs = {32: _bf_from(truth)}
    draft = truth[:400] + "N" * 30 + truth[430:]
    cfg = sealer.SealerConfig(k_values=[32], flank_length=32)
    out, stats = sealer.seal_records([("c1", draft)], bfs, cfg)
    assert stats["gaps_closed"] == 1
    assert out[0][1].upper() == truth


# --- device-batched DBG (konnector.DeviceDBG) --------------------------------
def test_device_dbg_matches_host_dbg():
    """Successor/predecessor sets from the device-batched probes must equal
    the host DBG's scalar probes (membership is pure)."""
    rng = np.random.default_rng(9)
    truth = _genome(rng, 2000)
    bf = _bf_from(truth)
    host = konnector.DBG(bf, K)
    dev = konnector.DeviceDBG(bf, K)
    kmers = [truth[i : i + K] for i in range(0, 500, 7)]
    # prefetch half as a frontier batch, leave the rest to miss-path calls
    dev.prefetch(kmers[::2], kmers[1::2])
    for km in kmers:
        assert dev.successors(km) == host.successors(km), km
        assert dev.predecessors(km) == host.predecessors(km), km


def test_seal_records_jax_backend_matches_host():
    """Full sealer run with the device-batched BFS: identical output and
    identical outcome counters to the host backend."""
    rng = np.random.default_rng(10)
    truth = _genome(rng, 3000)
    ks = [32, 28]
    bfs = {k: _bf_from(truth, k=k) for k in ks}
    draft = (
        truth[:700] + truth[700:760].lower() + truth[760:1500]
        + truth[1500:1580].lower() + truth[1580:]
    )
    cfg = sealer.SealerConfig(k_values=ks, flank_length=32, verbose=False)
    out_h, stats_h = sealer.seal_records([("c1 x", draft)], bfs, cfg)
    out_j, stats_j = sealer.seal_records(
        [("c1 x", draft)], bfs, cfg, backend="jax"
    )
    assert out_j == out_h
    assert stats_j == stats_h


def test_connect_pairs_batch_matches_serial():
    """Lockstep batched searches must give per-gap results identical to
    serial connect_pairs, for both host and device DBGs."""
    rng = np.random.default_rng(12)
    truth = _genome(rng, 4000)
    bf = _bf_from(truth)
    params = konnector.ConnectPairsParams(
        max_merged_seq_len=300, max_paths=10, max_branches=1000,
        max_cost=100000,
    )
    pairs = []
    for s in range(100, 3600, 500):
        left = truth[s : s + 64]
        right = konnector.revcomp(truth[s + 120 : s + 184])
        pairs.append((left, right))
    serial = [konnector.connect_pairs(konnector.DBG(bf, K), r1, r2, params)
              for r1, r2 in pairs]
    for dbg in (konnector.DBG(bf, K), konnector.DeviceDBG(bf, K)):
        batch = konnector.connect_pairs_batch(dbg, pairs, params)
        for s, b in zip(serial, batch):
            assert b.path_result == s.path_result
            assert b.merged_seqs == s.merged_seqs
            assert b.consensus == s.consensus
            assert b.cost == s.cost
            assert b.num_nodes_visited == s.num_nodes_visited


def test_mem_limit_aborts_search():
    """A tiny searchMem budget aborts a branchy search with
    EXCEEDED_MEM_LIMIT (reference ConstrainedBidiBFSVisitor.h memLimit,
    sealer.cpp:203) — and the exceededMemLimit counter can fire."""
    import numpy as np

    from goldpolish_tpu.ops import bloom, nthash as nt

    k = 16
    rng = np.random.default_rng(0)
    # saturated filter: every probe hits -> maximal branching
    bf = bloom.BloomFilter(1 << 10, 2, k)
    bf.array[:] = 0xFF
    left = "".join(rng.choice(list("ACGT"), 40))
    right = "".join(rng.choice(list("ACGT"), 40))
    dbg = konnector.DBG(bf, k)
    params = konnector.ConnectPairsParams(
        max_merged_seq_len=300, max_paths=1000000, max_branches=1000000,
        max_cost=10_000_000, mem_limit=50_000,
    )
    res = konnector.connect_pairs(dbg, left, right, params)
    assert res.path_result == "EXCEEDED_MEM_LIMIT"
    # same search with the default (large) budget does not trip the limit
    params2 = konnector.ConnectPairsParams(
        max_merged_seq_len=300, max_paths=2, max_branches=100,
        max_cost=100000, mem_limit=500 * 1024 * 1024,
    )
    res2 = konnector.connect_pairs(dbg, left, right, params2)
    assert res2.path_result != "EXCEEDED_MEM_LIMIT"


def test_fix_errors_and_preserve_reads():
    """fixErrors retries a failed anchor after a single-base correction
    (reference konnector.h:273-291, DBGBloomAlgorithms.h:127-180);
    preserveReads keeps the original read bytes in the merge
    (konnector.h:337-357)."""
    import numpy as np

    from goldpolish_tpu.ops import bloom, nthash as nt

    k, h = 16, 3
    rng = np.random.default_rng(4)
    truth = "".join(rng.choice(list("ACGT"), 300))
    bf = bloom.BloomFilter(1 << 14, h, k)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(
        np.frombuffer(truth.encode(), np.uint8), k), k, h))
    dbg = konnector.DBG(bf, k)
    left = truth[:28]  # short enough that one mid-read error kills EVERY window
    right = konnector.revcomp(truth[240:])
    bad = left[:14] + ("A" if left[14] != "A" else "C") + left[15:]
    # sanity: the corrupted read has no anchor at all
    assert konnector.get_start_kmer_pos(dbg, bad, 3) == konnector.NO_MATCH

    params = konnector.ConnectPairsParams(
        max_merged_seq_len=400, max_paths=2, max_branches=200,
        max_cost=50000,
    )
    res_plain = konnector.connect_pairs(dbg, bad, right, params)
    assert res_plain.path_result == "NO_PATH" and not res_plain.found_start

    params_fix = konnector.ConnectPairsParams(
        max_merged_seq_len=400, max_paths=2, max_branches=200,
        max_cost=50000, fix_errors=True,
    )
    res_fix = konnector.connect_pairs(dbg, bad, right, params_fix)
    assert res_fix.path_result == "FOUND_PATH"
    assert res_fix.read1 == left  # the single-base fix restored the truth
    assert res_fix.consensus.upper() == truth

    # preserveReads: merged sequence contains the reads verbatim
    params_pr = konnector.ConnectPairsParams(
        max_merged_seq_len=400, max_paths=2, max_branches=200,
        max_cost=50000, preserve_reads=True,
    )
    res_pr = konnector.connect_pairs(dbg, left, right, params_pr)
    assert res_pr.path_result == "FOUND_PATH"
    merged = res_pr.merged_seqs[0].upper()
    assert merged.startswith(left) and merged.endswith(konnector.revcomp(right))
    assert merged == truth


def test_native_extend4_matches_python():
    """gp_extend4 (native 4-way DBG extension probe) matches the pure-Python
    changelast/changefirst expansion bit-for-bit."""
    import numpy as np

    from goldpolish_tpu.ops import bloom, nthash as nt

    try:
        from goldpolish_tpu import native

        native.lib()
    except Exception:
        import pytest as _pytest

        _pytest.skip("native lib unavailable")
    rng = np.random.default_rng(12)
    for k in (16, 32, 47):
        truth = "".join(rng.choice(list("ACGT"), 2000))
        bf = bloom.BloomFilter(1 << 14, 3, k)
        bf.insert(nt.multi_hashes(nt.canonical_hashes(
            np.frombuffer(truth.encode(), np.uint8), k), k, 3))
        dbg = konnector.DBG(bf, k)
        assert dbg._ext4 is not None
        dbg_py = konnector.DBG(bf, k)
        dbg_py._ext4 = None
        for s in range(0, 1500, 97):
            kmer = truth[s : s + k]
            assert dbg.successors(kmer) == dbg_py.successors(kmer)
            assert dbg.predecessors(kmer) == dbg_py.predecessors(kmer)
