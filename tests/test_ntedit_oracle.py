"""Functional tests of the exact ntEdit oracle editor.

Scenario tests: build a Bloom filter from a ground-truth genome's k-mers,
introduce errors into a draft copy, polish, and check the errors are
corrected (and that error-free input passes through unchanged).
"""

import numpy as np
import pytest

from goldpolish_tpu.ops import bloom, nthash as nt
from goldpolish_tpu.polish import ntedit_oracle as ne


def _mk_bloom(truth: str, ks=(32,), h=4, bytes_size=bloom.DEFAULT_BF_BYTES):
    bfs = {}
    codes = nt.encode(truth)
    for k in ks:
        bf = bloom.BloomFilter(bytes_size, h, k)
        base = nt.canonical_hashes(codes, k)
        bf.insert(nt.multi_hashes(base, k, h))
        bfs[k] = bf
    return bfs


def _rand_genome(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(42)
    return _rand_genome(rng, 4000)


def test_clean_contig_unchanged(genome):
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    out, recs, _ = ne.polish_contig(genome.encode(), bf, cfg)
    assert out == genome.encode()
    assert recs == []


def test_single_substitution_corrected(genome):
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    draft = bytearray(genome.encode())
    pos = 1777
    orig = draft[pos]
    draft[pos] = ord("A") if orig != ord("A") else ord("C")
    out, recs, ed = ne.polish_contig(bytes(draft), bf, cfg)
    assert out == genome.encode()
    assert len(recs) == 1
    assert recs[0]["sub_base"] == orig
    assert ed.n_subs == 1


def test_multiple_substitutions_corrected(genome):
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    rng = np.random.default_rng(7)
    draft = bytearray(genome.encode())
    positions = sorted(rng.choice(np.arange(100, 3900), size=8, replace=False))
    # keep errors well-separated so each is independently correctable
    positions = [p for i, p in enumerate(positions) if i == 0 or p - positions[i - 1] > 96]
    for p in positions:
        orig = draft[p]
        draft[p] = ord("A") if orig != ord("A") else ord("C")
    out, recs, _ = ne.polish_contig(bytes(draft), bf, cfg)
    assert out == genome.encode()
    assert len(recs) == len(positions)


def test_single_deletion_corrected(genome):
    """Draft missing one base -> editor must insert it back."""
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    pos = 2000
    draft = genome[:pos] + genome[pos + 1 :]  # draft lost one base
    out, _, ed = ne.polish_contig(draft.encode(), bf, cfg)
    assert out == genome.encode()
    assert ed.n_ins >= 1


def test_single_insertion_corrected(genome):
    """Draft with one extra base -> editor must delete it."""
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    pos = 1500
    extra = "A" if genome[pos] != "A" else "C"
    draft = genome[:pos] + extra + genome[pos:]
    out, _, ed = ne.polish_contig(draft.encode(), bf, cfg)
    assert out == genome.encode()
    assert ed.n_dels >= 1


def test_short_contig_skipped(genome):
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, min_contig_len=100)
    out, recs, _ = ne.polish_contig(b"ACGT" * 10, bf, cfg)
    assert out == b"ACGT" * 10 and recs == []


def test_mask_mode_lowercases_unfixable(genome):
    """-a1 soft-masks missing k-mers with no fix (reference ntedit.cpp:1131-1146)."""
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True, mask=1)
    # corrupt a whole region so there is no fix
    draft = bytearray(genome.encode())
    rng = np.random.default_rng(3)
    for p in range(1000, 1040):
        draft[p] = ord(rng.choice(list("ACGT")))
    out, _, ed = ne.polish_contig(bytes(draft), bf, cfg)
    if ed.n_masked:
        assert any(97 <= c <= 122 for c in out)


def test_non_acgt_regions_skipped(genome):
    """k-mers containing non-ACGT are rolled over without edits
    (reference ntedit.cpp:1739-1759)."""
    bf = _mk_bloom(genome)[32]
    cfg = ne.Config(k=32, h=4, use_ratio=True)
    draft = bytearray(genome.encode())
    draft[2500:2510] = b"N" * 10
    out, _, _ = ne.polish_contig(bytes(draft), bf, cfg)
    assert out[2500:2510] == b"N" * 10


def test_multi_possible_bases_table():
    """Insertion combo table matches the reference enumeration
    (reference ntedit.cpp:198-343)."""
    mpb = ne.MULTI_POSSIBLE_BASES
    assert mpb["A"][:6] == ["A", "AA", "AC", "AG", "AT", "AAA"]
    assert len(mpb["C"]) == 341
    assert mpb["T"][20] == "TTT"
    assert mpb["G"][-1] == "GTTTT"
    assert ne.NUM_TRIES == [0, 1, 5, 21, 85, 341]


def test_is_repeat_insertion():
    assert ne.is_repeat_insertion("ATATAT")
    assert ne.is_repeat_insertion("AAAA")
    assert not ne.is_repeat_insertion("ACGTACG")
    assert not ne.is_repeat_insertion("A")


def test_mode2_fixes_simple_sub():
    """Mode 2 (exhaustive scan) on a clean single-sub draft recovers truth
    (reference ntedit.cpp:67-70 mode semantics)."""
    rng = np.random.default_rng(71)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(1500))
    bf = _mk_bloom(truth)[32]
    d = bytearray(truth.encode())
    d[700] = ord("A") if d[700] != ord("A") else ord("C")
    cfg = ne.Config(k=32, h=4, use_ratio=True, mode=2)
    out, recs, ed = ne.polish_contig(bytes(d), bf, cfg)
    assert out == truth.encode()
    assert ed.n_subs == 1


def test_secondary_bf_vetoes_repeat_kmers():
    """A secondary (repeat) BF containing the corrected k-mers suppresses
    the fix: _probe_fr treats secbf hits as absent (the reference's
    repeat-filter semantics), so the edit finds no accepted k-mer."""
    rng = np.random.default_rng(72)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(1200))
    bf = _mk_bloom(truth)[32]
    d = bytearray(truth.encode())
    p = 600
    d[p] = ord("A") if d[p] != ord("A") else ord("C")
    cfg = ne.Config(k=32, h=4, use_ratio=True, mode=0)
    out_plain, _recs, ed_plain = ne.polish_contig(bytes(d), bf, cfg)
    assert out_plain == truth.encode() and ed_plain.n_subs == 1
    # repeat BF = every truth k-mer overlapping the corrected position
    K = 32
    rep = bloom.BloomFilter(1 << 16, 4, K)
    window = truth[p - K + 1 : p + K]
    rep.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(window), K), K, 4))
    out_rep, _recs, ed_rep = ne.polish_contig(bytes(d), bf, cfg, rep)
    assert ed_rep.n_subs == 0  # the fix is vetoed
    assert out_rep != truth.encode()
