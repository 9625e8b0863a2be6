"""Internal minimizer mapper tests."""

import numpy as np

from goldpolish_tpu import mapper
from goldpolish_tpu.io import fasta


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


def test_minimizer_sketch_density():
    rng = np.random.default_rng(0)
    seq = _genome(rng, 5000)
    pos, hashes = mapper.minimizer_sketch(seq, k=24, w=100)
    # winnowing density ~ 2/(w+1): expect roughly 2*5000/101 ~ 99
    assert 40 < len(pos) < 250
    assert len(pos) == len(hashes)
    assert (np.diff(pos) > 0).all()


def test_sketch_shared_between_overlapping_seqs():
    rng = np.random.default_rng(1)
    seq = _genome(rng, 3000)
    _, h1 = mapper.minimizer_sketch(seq[:2000])
    _, h2 = mapper.minimizer_sketch(seq[1000:])
    shared = np.intersect1d(h1, h2)
    assert len(shared) > 5  # overlap region contributes common minimizers


def test_map_reads_assigns_correct_contig():
    rng = np.random.default_rng(2)
    contigs = [("c%d" % i, _genome(rng, 4000)) for i in range(3)]
    reads = []
    expected = {}
    for i, (cid, seq) in enumerate(contigs):
        for j in range(4):
            s = 500 * j
            rid = f"r{i}_{j}"
            reads.append((rid, seq[s : s + 1500]))
            expected[rid] = cid
    rows = list(mapper.map_reads(contigs, reads))
    by_read = {}
    for rid, cid, cnt in rows:
        if cnt > by_read.get(rid, ("", 0))[1]:
            by_read[rid] = (cid, cnt)
    for rid, cid in expected.items():
        assert by_read[rid][0] == cid, rid


def test_write_mapping_tsv_feeds_allmappings(tmp_path):
    rng = np.random.default_rng(3)
    truth = _genome(rng, 5000)
    target = str(tmp_path / "t.fa")
    reads = str(tmp_path / "r.fa")
    fasta.write_fasta(target, [("ctg1", truth)])
    fasta.write_fasta(
        reads, [(f"r{i}", truth[i * 800 : i * 800 + 2000]) for i in range(5)]
    )
    tsv = str(tmp_path / "m.tsv")
    n = mapper.write_mapping_tsv(target, reads, tsv)
    assert n >= 5
    from goldpolish_tpu.mappings import AllMappings

    class Idx:
        def seq_exists(self, rid):
            return rid == "ctg1"

        def get_seq_len(self, rid):
            return 5000

    m = AllMappings.load(tsv, Idx())
    assert len(m.get_mappings("ctg1")) == 5


def test_bulk_pipeline_with_internal_mapper(tmp_path):
    """End-to-end: no --mappings, no external mapper -> internal mapper."""
    from goldpolish_tpu.config import PipelineConfig
    from goldpolish_tpu.pipeline import bulk

    rng = np.random.default_rng(4)
    truth = _genome(rng, 6000)
    d = list(truth)
    d[3000] = "A" if d[3000] != "A" else "C"
    draft = "".join(d)
    draft_path = str(tmp_path / "draft.fa")
    reads_path = str(tmp_path / "reads.fq")
    fasta.write_fasta(draft_path, [("ctg1", draft)])
    with open(reads_path, "w") as rf:
        for rep in range(8):
            for s in range(0, 6000, 1000):
                e = min(6000, s + 2000)
                if e - s < 500:
                    continue
                rf.write(f"@q{rep}_{s}\n{truth[s:e]}\n+\n{'I' * (e - s)}\n")
    out = str(tmp_path / "out.fa")
    cfg = PipelineConfig(
        seqs_to_polish=draft_path, polishing_seqs=reads_path, output_seqs=out,
        k_values=[32], workspace=str(tmp_path), run_sealer=False,
    )
    import os as _os
    cwd = _os.getcwd()
    _os.chdir(tmp_path)
    try:
        bulk.run_bulk(cfg)
    finally:
        _os.chdir(cwd)
    rec = list(fasta.read_seqs(out))[0]
    assert rec.seq == truth


def test_minimizer_sketch_jax_matches_host():
    """Device minimizer selection (reduce_window identity) must pick the
    same positions/hashes as the host sliding-window argmin (64-bit hashes
    make ties — the only possible divergence — vanishingly improbable)."""
    from goldpolish_tpu import mapper

    rng = np.random.default_rng(21)
    for n, k, w in ((5000, 24, 100), (1200, 16, 32), (300, 24, 100)):
        seq = "".join(rng.choice(list("ACGT")) for _ in range(n))
        pos_h, h_h = mapper.minimizer_sketch(seq, k, w)
        pos_j, h_j = mapper.minimizer_sketch_jax(seq, k, w)
        assert np.array_equal(pos_h, pos_j), (n, k, w)
        assert np.array_equal(h_h, h_j)
