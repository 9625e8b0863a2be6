"""Integration test on the reference repo's bundled draft assembly.

The reference golden tests need reads downloaded from the internet
(reference: tests/goldpolish_test.sh:6 — zero-egress here), so this test
treats the bundled draft as ground truth: mutate it, simulate reads from it,
polish the mutated copy back, and require exact recovery.  This exercises
realistic contig content (real GoldRush sequence, multiple contigs,
non-uniform composition) at pipeline scale.
"""

import os

import numpy as np
import pytest

from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.io import fasta
from goldpolish_tpu.pipeline import bulk

REF_DRAFT = "/root/reference/tests/goldpolish_target_test_golden_path.fa"


@pytest.mark.skipif(not os.path.exists(REF_DRAFT), reason="reference data absent")
def test_polish_reference_draft_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    truths = [(r.name, r.seq.upper()) for r in fasta.read_seqs(REF_DRAFT)]
    assert truths, "reference draft empty?"

    # mutate each contig (~1 error / 600 bp, mixed types)
    drafts = []
    n_err_total = 0
    for name, t in truths:
        d = list(t)
        for p in range(300, len(t) - 300, 601):
            kind = p % 3
            if kind == 0:
                d[p] = "ACGT"[("ACGT".index(d[p]) + 1) % 4] if d[p] in "ACGT" else d[p]
            elif kind == 1:
                d[p] = ""
            else:
                d[p] = d[p] + "A"
            n_err_total += 1
        drafts.append((name, "".join(d)))
    draft_path = str(tmp_path / "draft.fa")
    fasta.write_fasta(draft_path, drafts)

    # simulate 8x tiled reads from the truth
    reads_path = str(tmp_path / "reads.fq")
    paf_path = str(tmp_path / "map.paf")
    frag, step = 6000, 3000
    with open(reads_path, "w") as rf, open(paf_path, "w") as pf:
        rn = 0
        for rep in range(6):
            for name, t in truths:
                cid = name.split()[0]
                for s in range(0, len(t), step):
                    e = min(len(t), s + frag)
                    if e - s < 500:
                        continue
                    rf.write(f"@r{rn}\n{t[s:e]}\n+\n{'I' * (e - s)}\n")
                    pf.write(
                        f"r{rn}\t{e-s}\t0\t{e-s}\t+\t{cid}\t{len(t)}\t{s}\t{e}\t"
                        f"{e-s}\t{e-s}\t60\n"
                    )
                    rn += 1

    out = str(tmp_path / "polished.fa")
    cfg = PipelineConfig(
        seqs_to_polish=draft_path, polishing_seqs=reads_path, output_seqs=out,
        k_values=[32, 28], batch_size=4, mappings_path=paf_path,
        workspace=str(tmp_path), max_concurrent_batches=2,
    )
    totals = bulk.run_bulk(cfg)
    assert totals["contigs"] == len(truths)

    recs = list(fasta.read_seqs(out))
    mismatched = []
    for (name, t), r in zip(truths, recs):
        if r.seq != t:
            mismatched.append(name)
    assert not mismatched, f"{len(mismatched)} contigs not recovered: {mismatched[:3]}"


@pytest.mark.skipif(not os.path.exists(REF_DRAFT), reason="reference data absent")
def test_engine_oracle_differential_on_real_sequence():
    """Engine byte-parity vs the oracle on real GoldRush draft content
    (repeats, non-uniform composition — harder than synthetic ACGT)."""
    from goldpolish_tpu.ops import bloom, nthash as nt
    from goldpolish_tpu.polish import ntedit_oracle as ne
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    rng = np.random.default_rng(1)
    recs = list(fasta.read_seqs(REF_DRAFT))[:2]
    for rec in recs:
        truth = rec.seq.upper()[:6000]
        bf = bloom.BloomFilter(1 << 18, 4, 32)
        bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), 32), 32, 4))
        d = list(truth)
        for p in range(300, len(truth) - 300, 471):
            kind = p % 3
            if kind == 0:
                d[p] = "ACGT"[("ACGT".index(d[p]) + 1) % 4] if d[p] in "ACGT" else d[p]
            elif kind == 1:
                d[p] = ""
            else:
                d[p] = d[p] + "T"
        draft = "".join(d).encode()
        for cfg in (
            ne.Config(k=32, h=4, use_ratio=True, mode=1, mask=1),
            ne.Config(k=32, h=4, use_ratio=True, mode=0),
        ):
            out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg)
            out_t, recs_t, _ = NtEditTPU(cfg, bf).polish_contig(draft)
            assert out_t == out_o and recs_t == recs_o, rec.id
