"""Targeted mode: extraction, PAF remap, splice-back, full recursion."""

import numpy as np
import pytest

from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.io import fasta
from goldpolish_tpu.pipeline import targeted


def test_extract_masked_basic():
    seq = "A" * 200 + "acgt" * 10 + "G" * 200
    gaps = list(targeted.extract_masked_subsequences(seq, "c1", 64))
    assert len(gaps) == 1
    gid, desc, sub = gaps[0]
    assert gid == "c1.1"
    assert desc == f"{200-64}-{200+40+64}"
    assert sub == seq[200 - 64 : 200 + 40 + 64].upper()


def test_extract_short_upper_merges_into_gap():
    """Uppercase separators < 2*flank merge into surrounding gaps
    (reference extract-seq.py:71-89)."""
    seq = "A" * 200 + "acgt" * 5 + "GGGG" + "tttt" * 5 + "C" * 200
    gaps = list(targeted.extract_masked_subsequences(seq, "c1", 64))
    assert len(gaps) == 1  # one merged gap spanning both runs
    _, desc, _ = gaps[0]
    start, end = map(int, desc.split("-"))
    assert start == 200 - 64 and end == 200 + 20 + 4 + 20 + 64


def test_extract_single_base_gap_skipped():
    """Gaps of length 1 are not extracted (strict > MIN_GAP_LENGTH)."""
    seq = "A" * 200 + "a" + "G" * 200
    assert list(targeted.extract_masked_subsequences(seq, "c1", 64)) == []


def test_extract_from_bed_merges_close_intervals():
    seq = "ACGT" * 300
    coords = [("100", "150"), ("200", "260"), ("700", "750")]
    gaps = list(targeted.extract_from_bed(seq, "c1", 64, coords))
    # first two merge (gap 50 < 2*64), third separate
    assert len(gaps) == 2
    assert gaps[0][0] == "c1.1" and gaps[1][0] == "c1.2"
    s0, e0 = map(int, gaps[0][1].split("-"))
    assert s0 == 100 - 64 and e0 == 260 + 64


def test_update_paf_four_cases(tmp_path):
    gaps = tmp_path / "gaps.fa"
    gaps.write_text(">ctg.1 100-200\n" + "A" * 101 + "\n")
    paf = tmp_path / "in.paf"
    rows = [
        # fully inside the gap interval [100, 201)
        "r1\t500\t10\t110\t+\tctg\t1000\t120\t180\t50\t60\t60",
        # overhangs right
        "r2\t500\t0\t300\t+\tctg\t1000\t150\t400\t50\t250\t60",
        # overhangs left
        "r3\t500\t0\t300\t+\tctg\t1000\t50\t150\t50\t100\t60",
        # spans the whole gap
        "r4\t500\t0\t400\t+\tctg\t1000\t50\t400\t50\t350\t60",
        # no overlap -> dropped
        "r5\t500\t0\t100\t+\tctg\t1000\t500\t600\t50\t100\t60",
        # unknown contig -> dropped
        "r6\t500\t0\t100\t+\tother\t1000\t120\t180\t50\t60\t60",
    ]
    paf.write_text("\n".join(rows) + "\n")
    out = tmp_path / "out.paf"
    trees = targeted.build_gap_index(str(gaps))
    n = targeted.update_paf(str(paf), trees, str(out))
    assert n == 4
    got = [line.split("\t") for line in out.read_text().splitlines()]
    by_name = {g[0]: g for g in got}
    # r1: inside -> target coords shift by gap start
    assert by_name["r1"][5] == "ctg.1"
    assert (by_name["r1"][7], by_name["r1"][8]) == ("20", "80")
    # r2: right overhang clamps target end, shrinks query end
    assert (by_name["r2"][7], by_name["r2"][8]) == ("50", "101")
    assert by_name["r2"][3] == str(300 - (400 - 201))
    # r3: left overhang clamps target start, shifts query start
    assert (by_name["r3"][7], by_name["r3"][8]) == ("0", "50")
    assert by_name["r3"][2] == str(0 + (100 - 50))
    # r4: both clamped
    assert (by_name["r4"][7], by_name["r4"][8]) == ("0", "101")


def test_insert_polished_gaps(tmp_path):
    orig = tmp_path / "orig.fa"
    orig.write_text(">c1\n" + "A" * 50 + "acgtacgt" + "G" * 50 + "\n>c2\nTTTT\n")
    gaps = tmp_path / "gaps.fa"
    gaps.write_text(">c1.1 40-76\n" + "X" * 36 + "\n")
    out = tmp_path / "out.fa"
    targeted.insert_polished_gaps(str(orig), str(gaps), str(out))
    recs = {r.id: r.seq for r in fasta.read_seqs(str(out))}
    assert recs["c1"] == "A" * 40 + "X" * 36 + "G" * 32
    assert recs["c2"] == "TTTT"


def test_targeted_end_to_end(tmp_path):
    """Softmasked gap region polished through the full recursion."""
    rng = np.random.default_rng(0)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(4000))
    # draft: errors inside a softmasked window [1000, 3000) — the window must
    # be large enough that the targeted recursion's 100-reads/10kbp subsample
    # retains spanning coverage (reference smk:97-103 hardcodes -s 100)
    d = list(truth)
    d[1900] = "A" if d[1900] != "A" else "C"
    d[1950] = ""
    draft = "".join(d)
    draft_sm = draft[:1000] + draft[1000:3000].lower() + draft[3000:]
    draft_path = str(tmp_path / "draft.fa")
    fasta.write_fasta(draft_path, [fasta.SeqRecord("ctgA", "", draft_sm)])

    reads_path = str(tmp_path / "reads.fq")
    paf_path = str(tmp_path / "map.paf")
    frag, step = 1200, 600
    with open(reads_path, "w") as rf, open(paf_path, "w") as pf:
        rn = 0
        for rep in range(8):
            for s in range(0, 4000, step):
                e = min(4000, s + frag)
                if e - s < 300:
                    continue
                rf.write(f"@r{rn}\n{truth[s:e]}\n+\n{'I' * (e - s)}\n")
                pf.write(
                    f"r{rn}\t{e-s}\t0\t{e-s}\t+\tctgA\t4000\t{s}\t{e}\t{e-s}\t{e-s}\t60\n"
                )
                rn += 1
    out = str(tmp_path / "polished.fa")
    cfg = PipelineConfig(
        seqs_to_polish=draft_path, polishing_seqs=reads_path, output_seqs=out,
        k_values=[32, 28], mappings_path=paf_path, target=True,
        flank_length=64, workspace=str(tmp_path), run_sealer=True,
    )
    res = targeted.run_targeted(cfg)
    assert res["gaps"] == 1
    recs = list(fasta.read_seqs(out))
    assert recs[0].id == "ctgA"
    assert recs[0].seq == truth  # errors inside the target region fixed


def test_targeted_no_gaps_passthrough(tmp_path):
    draft_path = str(tmp_path / "d.fa")
    fasta.write_fasta(draft_path, [fasta.SeqRecord("c1", "", "ACGT" * 100)])
    out = str(tmp_path / "o.fa")
    cfg = PipelineConfig(
        seqs_to_polish=draft_path, polishing_seqs=draft_path, output_seqs=out,
        target=True, workspace=str(tmp_path),
    )
    res = targeted.run_targeted(cfg)
    assert res["gaps"] == 0
    assert list(fasta.read_seqs(out))[0].seq == "ACGT" * 100


def test_target_dev_keeps_intermediates(tmp_path):
    """Intermediates are removed by default (reference goldpolish-target.py
    INTERMEDIATE_* cleanup) and kept with target_dev."""
    import glob
    import os

    rng = np.random.default_rng(5)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(3000))
    d = list(truth)
    d[1500] = "A" if d[1500] != "A" else "C"
    draft = "".join(d)
    draft_sm = draft[:1200] + draft[1200:1800].lower() + draft[1800:]
    draft_path = str(tmp_path / "draft.fa")
    fasta.write_fasta(draft_path, [fasta.SeqRecord("c1", "", draft_sm)])
    reads_path = str(tmp_path / "reads.fq")
    paf_path = str(tmp_path / "map.paf")
    with open(reads_path, "w") as rf, open(paf_path, "w") as pf:
        rn = 0
        for rep in range(8):
            for s in range(0, 3000, 500):
                e = min(3000, s + 1000)
                if e - s < 300:
                    continue
                rf.write(f"@r{rn}\n{truth[s:e]}\n+\n{'I' * (e - s)}\n")
                pf.write(
                    f"r{rn}\t{e-s}\t0\t{e-s}\t+\tc1\t3000\t{s}\t{e}\t{e-s}\t{e-s}\t60\n"
                )
                rn += 1
    for dev in (False, True):
        out = str(tmp_path / f"out{int(dev)}.fa")
        cfg = PipelineConfig(
            seqs_to_polish=draft_path, polishing_seqs=reads_path,
            output_seqs=out, k_values=[32, 28], mappings_path=paf_path,
            target=True, flank_length=64, workspace=str(tmp_path),
            target_dev=dev, benchmark=True,
        )
        targeted.run_targeted(cfg)
        work = glob.glob(str(tmp_path / "GoldPolish-Target_work*"))
        if not dev:
            assert work == [], work
        else:
            # the three reference intermediates survive (derived caches
            # like the gaps SeqIndex may accompany them)
            names = {os.path.basename(p) for p in work}
            assert {
                "GoldPolish-Target_work.gaps.fa",
                "GoldPolish-Target_work.gaps.paf",
                "GoldPolish-Target_work.gaps.goldpolished.fa",
            } <= names, (dev, work)
        for p in work:
            os.remove(p)
