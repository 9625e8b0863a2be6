"""Edit-report writers + polish router + index CLI."""

import numpy as np

from goldpolish_tpu.io import seqindex
from goldpolish_tpu.ops import bloom, nthash as nt
from goldpolish_tpu.polish import ntedit_oracle as ne, polish_contig, reports


def test_changes_tsv_and_vcf(tmp_path):
    recs = [
        {"pos": 9, "draft_char": ord("A"), "sub_base": ord("G"),
         "num_support": 7, "altbase1": ord("T"), "altsupp1": 3},
        {"pos": 20, "draft_char": ord("C"), "sub_base": ord("T"),
         "num_support": 9},
    ]
    tsv = tmp_path / "changes.tsv"
    reports.write_changes_tsv(str(tsv), [("ctg1", recs)], k=32, jump=3)
    lines = tsv.read_text().splitlines()
    assert lines[0].startswith("ID\tbpPosition+1")
    assert lines[1].split("\t")[:5] == ["ctg1", "10", "A", "G", "7"]
    assert lines[1].split("\t")[5:7] == ["T", "3"]

    vcf = tmp_path / "v.vcf"
    reports.write_vcf(str(vcf), [("ctg1", recs)], "draft.fa")
    body = [l for l in vcf.read_text().splitlines() if not l.startswith("#")]
    assert body[0].split("\t")[:5] == ["ctg1", "10", ".", "A", "G,T"]
    assert "AD=7,3" in body[0] and "1/2" in body[0]
    assert body[1].split("\t")[4] == "T" and "1/1" in body[1]


def test_sealer_trace(tmp_path):
    rows = [{"k": 32, "read_id": "c_10_5", "search_result": "FOUND_PATH",
             "search_cost": 42, "num_paths": 1, "path_lengths": "37",
             "start_kmer_pos": 3, "end_kmer_pos": 1, "nodes_visited": 99,
             "max_breadth": 4}]
    p = tmp_path / "trace.tsv"
    reports.write_sealer_trace(str(p), rows)
    lines = p.read_text().splitlines()
    assert lines[0].split("\t")[0] == "k"
    assert lines[1].split("\t")[2] == "FOUND_PATH"


def test_polish_router_snv_falls_back_to_oracle():
    rng = np.random.default_rng(0)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(500))
    bf = bloom.BloomFilter(1 << 15, 4, 32)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), 32), 32, 4))
    cfg = ne.Config(k=32, h=4, use_ratio=True, snv=1)
    out, recs, _ = polish_contig(truth.encode(), bf, cfg)
    assert isinstance(out, bytes)  # oracle path ran (engine would raise)


def test_seqindex_cli(tmp_path, capsys):
    fa = tmp_path / "x.fa"
    fa.write_text(">a\nACGT\n>b\nGGGG\n")
    out = tmp_path / "x.index"
    assert seqindex._main([str(fa), str(out)]) == 0
    assert "indexed 2 records" in capsys.readouterr().out
    idx = seqindex.SeqIndex.load(str(out), str(fa))
    assert idx.get_seq("b") == b"GGGG"
