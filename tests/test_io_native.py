"""IO layer + native library parity tests."""

import os

import numpy as np
import pytest

from goldpolish_tpu.io import fasta, seqindex
from goldpolish_tpu.ops import bloom, nthash as nt


@pytest.fixture
def sample_fastq(tmp_path):
    p = tmp_path / "reads.fq"
    p.write_text(
        "@r1 some comment\nACGTACGTAA\n+\nIIIIIIIIII\n"
        "@r2\nTTTTGGGGCC\n+\n!!!!!!!!!!\n"
    )
    return str(p)


@pytest.fixture
def sample_fasta(tmp_path):
    p = tmp_path / "draft.fa"
    p.write_text(">c1 first contig\nACGTACGTACGT\n>c2\nGGGGCCCC\n")
    return str(p)


def test_fasta_reader(sample_fasta):
    recs = list(fasta.read_seqs(sample_fasta))
    assert [r.id for r in recs] == ["c1", "c2"]
    assert recs[0].comment == "first contig"
    assert recs[0].name == "c1 first contig"
    assert recs[1].seq == "GGGGCCCC"


def test_fastq_reader(sample_fastq):
    recs = list(fasta.read_seqs(sample_fastq))
    assert recs[0].qual == "IIIIIIIIII"
    assert recs[1].seq == "TTTTGGGGCC"


def test_fasta_writer_roundtrip(tmp_path, sample_fasta):
    out = str(tmp_path / "out.fa")
    fasta.write_fasta(out, fasta.read_seqs(sample_fasta))
    recs = list(fasta.read_seqs(out))
    assert [r.seq for r in recs] == ["ACGTACGTACGT", "GGGGCCCC"]


def test_gzip_reader(tmp_path):
    import gzip

    p = tmp_path / "reads.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(">a\nACGT\n")
    recs = list(fasta.read_seqs(str(p)))
    assert recs[0].seq == "ACGT"


def test_seqindex_python_fasta(sample_fasta):
    idx = seqindex.SeqIndex.build(sample_fasta, use_native=False)
    assert idx.get_seq("c1") == b"ACGTACGTACGT"
    assert idx.get_seq("c2") == b"GGGGCCCC"
    assert idx.get_seq_len("c1") == 12
    assert idx.seq_exists("c2") and not idx.seq_exists("c3")


def test_seqindex_python_fastq_phred(sample_fastq):
    idx = seqindex.SeqIndex.build(sample_fastq, use_native=False)
    assert idx.get_seq("r1") == b"ACGTACGTAA"
    # phred avg over first len-1 quals (reference seqindex.cpp:45)
    assert idx.get_phred_avg("r1") == pytest.approx(ord("I") - 33)
    assert idx.get_phred_avg("r2") == pytest.approx(0.0)


def test_seqindex_tsv_roundtrip(tmp_path, sample_fastq):
    idx = seqindex.SeqIndex.build(sample_fastq, use_native=False)
    tsv = str(tmp_path / "reads.index")
    idx.save(tsv)
    idx2 = seqindex.SeqIndex.load(tsv, sample_fastq)
    assert idx2.get_seq("r1") == b"ACGTACGTAA"
    assert idx2.get_phred_avg("r1") == pytest.approx(idx.get_phred_avg("r1"))


# --- native library ----------------------------------------------------------
@pytest.fixture(scope="module")
def native_lib():
    native = pytest.importorskip("goldpolish_tpu.native")
    try:
        native.lib()
    except native.NativeUnavailable as e:
        if os.environ.get("GPTPU_NATIVE_OPTIONAL"):
            pytest.skip(f"native unavailable: {e}")
        # in the development environment a failed .so build is a broken
        # commit, not a missing optional dependency — fail loudly (a skip
        # here once hid a compile error as "7 passed, 5 skipped")
        pytest.fail(f"native build failed: {e}")
    return native


def test_native_nthash_matches_numpy(native_lib):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGTacgtN")) for _ in range(500))
    codes = nt.encode(seq)
    for k in (20, 32):
        got = native_lib.nthash_all(codes, k, 4)
        base = nt.canonical_hashes(codes, k)
        want = nt.multi_hashes(base, k, 4)
        assert np.array_equal(got, want)


def test_native_fill_bfs_matches_python(native_lib):
    rng = np.random.default_rng(1)
    reads = [
        "".join(rng.choice(list("ACGT")) for _ in range(300)) for _ in range(6)
    ]
    ks = [32, 28]
    h, thresh = 4, 5

    def build(fill_fn):
        cbfs = [bloom.CountingBloomFilter8(1 << 16, h, k) for k in ks]
        bfs = [bloom.BloomFilter(1 << 14, h, k) for k in ks]
        for r in reads * 4:  # repeat so promotions happen
            fill_fn(nt.encode(r), h, ks, thresh, cbfs, bfs)
        return cbfs, bfs

    import functools

    cbfs_py, bfs_py = build(bloom.fill_bfs)
    # bit-exact reference semantics (CBF + BF) with the shortcut off
    cbfs_nat, bfs_nat = build(
        functools.partial(native_lib.fill_bfs, skip_promoted=False)
    )
    for a, b in zip(cbfs_py, cbfs_nat):
        assert np.array_equal(a.counters, b.counters)
    for a, b in zip(bfs_py, bfs_nat):
        assert np.array_equal(a.array, b.array)
    assert bfs_py[0].pop_count > 0  # something was promoted
    # the production shortcut (skip CBF work once bits read set) must leave
    # the BF array bit-identical; only the discarded CBF counts may differ
    _cbfs_fast, bfs_fast = build(native_lib.fill_bfs)
    for a, b in zip(bfs_py, bfs_fast):
        assert np.array_equal(a.array, b.array)


def test_native_bf_contains(native_lib):
    rng = np.random.default_rng(2)
    seq = "".join(rng.choice(list("ACGT")) for _ in range(400))
    k, h = 32, 4
    bf = bloom.BloomFilter(1 << 14, h, k)
    hashes = nt.multi_hashes(nt.canonical_hashes(nt.encode(seq), k), k, h)
    bf.insert(hashes[::3])
    got = native_lib.bf_contains(bf, hashes)
    assert np.array_equal(got, bf.contains(hashes))


def test_native_seqindex_matches_python(native_lib, tmp_path, sample_fastq):
    idx_nat = seqindex.SeqIndex.build(sample_fastq, use_native=True)
    idx_py = seqindex.SeqIndex.build(sample_fastq, use_native=False)
    for rid in idx_py.ids():
        assert idx_nat.get_seq(rid) == idx_py.get_seq(rid)
        assert idx_nat.get_phred_avg(rid) == pytest.approx(
            idx_py.get_phred_avg(rid)
        )


def test_native_eval_sites_matches_numpy(native_lib):
    from goldpolish_tpu.ops import siteeval

    rng = np.random.default_rng(9)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(800))
    k, h = 32, 4
    bf = bloom.BloomFilter(1 << 16, h, k)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), k), k, h))
    draft = bytearray(truth.encode())
    for p in (200, 400, 600):
        draft[p] = ord("A") if draft[p] != ord("A") else ord("G")
    draft[300:301] = b""  # deletion
    codes = np.frombuffer(bytes(draft), np.uint8)
    tables = siteeval.make_tables(k, 3)
    sites = np.array([200 - k + 1, 300 - k + 1, 400 - k + 2, 650, 30], np.int64)
    want = siteeval.eval_sites_np(codes, sites, bf, tables, h)
    # skip_unused=False: full-array parity (production leaves decision-dead
    # ins lanes at zero; the end-to-end differential suites cover that path)
    got = native_lib.eval_sites(codes, sites, bf, tables, h, skip_unused=False)
    # compare only the lanes backed by real candidates: the padded 4th lane
    # is never consumed by run_trials and its values are don't-care
    draft_chars = np.where(
        (codes[sites + k - 1] >= 97) & (codes[sites + k - 1] <= 122),
        codes[sites + k - 1] - 32, codes[sites + k - 1],
    )
    lane_valid = (
        np.arange(4)[None, :] < tables.sub_cand_n[draft_chars][:, None]
    )
    assert np.array_equal(got.gate & lane_valid, want.gate & lane_valid)
    assert np.array_equal(
        np.where(lane_valid, got.sub_support, 0),
        np.where(lane_valid, want.sub_support, 0),
    )
    assert np.array_equal(
        np.where(lane_valid[:, :, None], got.ins_support, 0),
        np.where(lane_valid[:, :, None], want.ins_support, 0),
    )
    assert np.array_equal(got.del_support, want.del_support)
    assert np.array_equal(got.sub_cand, want.sub_cand)
