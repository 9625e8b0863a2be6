"""Mapping store: parsers, dedup, adaptive minimizer filter."""

import numpy as np
import pytest

from goldpolish_tpu.mappings import AllMappings


class FakeIndex:
    def __init__(self, lens):
        self.lens = lens

    def seq_exists(self, rid):
        return rid in self.lens

    def get_seq_len(self, rid):
        return self.lens[rid]


def test_paf_parsing_and_dedup(tmp_path):
    p = tmp_path / "m.paf"
    p.write_text(
        "r1\t100\t0\t100\t+\tc1\t1000\t0\t100\t90\t100\t60\n"
        "r1\t100\t0\t100\t+\tc1\t1000\t200\t300\t90\t100\t60\n"  # dup pair
        "r2\t100\t0\t100\t-\tc1\t1000\t0\t100\t90\t100\t60\n"
        "r3\t100\t0\t100\t+\tcX\t1000\t0\t100\t90\t100\t60\n"  # unknown contig
    )
    idx = FakeIndex({"c1": 1000})
    m = AllMappings.load(str(p), idx)
    assert m.get_mappings("c1") == ["r1", "r2"]
    assert m.get_mappings("cX") == []


def test_sam_parsing(tmp_path):
    p = tmp_path / "m.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "r1\t0\tc1\t1\t60\t100M\t*\t0\t0\tACGT\tIIII\n"
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n"  # unmapped -> target '*'
    )
    idx = FakeIndex({"c1": 1000})
    m = AllMappings.load(str(p), idx)
    assert m.get_mappings("c1") == ["r1"]


def test_ntlink_threshold_and_filter(tmp_path):
    # 30 reads with ascending minimizer counts 1..30 on a 1000bp contig
    rows = [f"r{i}\tc1\t{i}\n" for i in range(1, 31)]
    p = tmp_path / "m.tsv"
    p.write_text("".join(rows))
    idx = FakeIndex({"c1": 1000})
    # cap: ceil(1000 * 100 / 10000) = 10 reads -> binary search raises the
    # threshold until <= 10 remain (reads with mx >= 21)
    m = AllMappings.load(str(p), idx, mx_max_mapped_seqs_per_target_10kbp=100.0)
    kept = m.get_mappings("c1")
    assert len(kept) == 10
    assert kept == [f"r{i}" for i in range(21, 31)]


def test_ntlink_no_filter_when_under_cap(tmp_path):
    rows = [f"r{i}\tc1\t{5+i}\n" for i in range(5)]
    p = tmp_path / "m.tsv"
    p.write_text("".join(rows))
    idx = FakeIndex({"c1": 100000})
    m = AllMappings.load(str(p), idx)
    assert len(m.get_mappings("c1")) == 5


def test_ntlink_min_threshold_drops_rows(tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text("r1\tc1\t0\nr2\tc1\t1\n")
    idx = FakeIndex({"c1": 100000})
    m = AllMappings.load(str(p), idx)  # mx_threshold_min = 1
    assert m.get_mappings("c1") == ["r2"]
