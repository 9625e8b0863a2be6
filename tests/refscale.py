"""Deterministic reference-scale golden-fixture inputs.

The reference's own golden tests run the CLI on the bundled 1.1 MB draft
(tests/goldpolish_test.sh:11-18) with reads downloaded at test time —
unavailable here (zero egress).  The committed goldens therefore pin THIS
pipeline's byte-exact output on deterministic inputs derived from the same
bundled drafts: real GoldRush sequence (152 contigs bulk / 7 contigs
targeted), mutated + gapped with a fixed seed, reads simulated from the
unmutated sequence.  tools/make_golden_refscale.py generates the expected
files; tests/test_golden_refscale.py regenerates the inputs and requires
byte equality (the reference's `cmp` contract).
"""

from __future__ import annotations

import os

import numpy as np

REF_BULK_DRAFT = "/root/reference/tests/goldrush_test_golden_path.fa"
REF_TARGET_DRAFT = "/root/reference/tests/goldpolish_target_test_golden_path.fa"
SEED = 20260819


def _read_fasta(path):
    from goldpolish_tpu.io import fasta

    return [(r.name, r.seq.upper()) for r in fasta.read_seqs(path)]


def _mutate(truths, rng, err_every=701, gap_len=60, gap_min_contig=4000):
    """Mixed errors every ~err_every bp plus one n-gap per large contig."""
    drafts = []
    for name, t in truths:
        d = list(t)
        for p in range(300, len(t) - 300, err_every):
            kind = p % 3
            if kind == 0 and d[p] in "ACGT":
                d[p] = "ACGT"[("ACGT".index(d[p]) + 1 + int(rng.integers(3))) % 4]
            elif kind == 1:
                d[p] = ""
            else:
                d[p] = d[p] + "ACGT"[int(rng.integers(4))]
        if len(t) >= gap_min_contig:
            mid = len(t) // 2
            d[mid : mid + gap_len] = ["n"] * gap_len
        drafts.append((name, "".join(d)))
    return drafts


def _simulate_reads(truths, reads_path, paf_path, frag=6000, step=3000,
                    passes=5):
    """Staggered tiled fragments of the truth + a PAF (no external mapper)."""
    with open(reads_path, "w") as rf, open(paf_path, "w") as pf:
        rn = 0
        for rep in range(passes):
            off = (rep * step // passes)
            for name, t in truths:
                cid = name.split()[0]
                n = len(t)
                starts = [0] if off else []
                starts += list(range(off, n, step))
                for s in starts:
                    e = min(n, s + frag)
                    if e - s < 400:
                        continue
                    rf.write(f"@r{rn}\n{t[s:e]}\n+\n{'I' * (e - s)}\n")
                    pf.write(
                        f"r{rn}\t{e-s}\t0\t{e-s}\t+\t{cid}\t{n}\t{s}\t{e}\t"
                        f"{e-s}\t{e-s}\t60\n"
                    )
                    rn += 1


def build_bulk_inputs(tmp_dir: str):
    """Bulk-mode inputs from the bundled 1.1 MB draft; returns cfg."""
    from goldpolish_tpu.config import PipelineConfig
    from goldpolish_tpu.io import fasta

    rng = np.random.default_rng(SEED)
    truths = _read_fasta(REF_BULK_DRAFT)
    drafts = _mutate(truths, rng)
    draft_path = os.path.join(tmp_dir, "bulk_draft.fa")
    fasta.write_fasta(draft_path, drafts)
    reads_path = os.path.join(tmp_dir, "bulk_reads.fq")
    paf_path = os.path.join(tmp_dir, "bulk_map.paf")
    _simulate_reads(truths, reads_path, paf_path)
    return PipelineConfig(
        seqs_to_polish=draft_path,
        polishing_seqs=reads_path,
        output_seqs=os.path.join(tmp_dir, "bulk_polished.fa"),
        mappings_path=paf_path,
        k_values=[32, 28, 24, 20],  # the reference's full default sweep
        batch_size=32,
        run_sealer=True,
        workspace=os.path.join(tmp_dir, "ws_bulk"),
        max_concurrent_batches=2,
    )


def build_targeted_inputs(tmp_dir: str):
    """Targeted-mode inputs (softmasked windows) from the 97 KB draft."""
    from goldpolish_tpu.config import PipelineConfig
    from goldpolish_tpu.io import fasta

    rng = np.random.default_rng(SEED + 1)
    truths = _read_fasta(REF_TARGET_DRAFT)
    records = []
    for name, t in truths:
        if len(t) < 6000:
            records.append((name, t))
            continue
        d = list(t)
        # errors inside the to-be-softmasked window
        a, b = len(t) // 3, len(t) // 3 + 2000
        for p in range(a + 200, b - 200, 433):
            if d[p] in "ACGT":
                d[p] = "ACGT"[("ACGT".index(d[p]) + 1 + int(rng.integers(3))) % 4]
        s = "".join(d)
        records.append((name, s[:a] + s[a:b].lower() + s[b:]))
    draft_path = os.path.join(tmp_dir, "tgt_draft.fa")
    fasta.write_fasta(draft_path, records)
    reads_path = os.path.join(tmp_dir, "tgt_reads.fq")
    paf_path = os.path.join(tmp_dir, "tgt_map.paf")
    _simulate_reads(truths, reads_path, paf_path, frag=3000, step=1500,
                    passes=6)
    return PipelineConfig(
        seqs_to_polish=draft_path,
        polishing_seqs=reads_path,
        output_seqs=os.path.join(tmp_dir, "tgt_polished.fa"),
        mappings_path=paf_path,
        k_values=[32, 28],
        target=True,
        flank_length=64,
        run_sealer=True,
        workspace=os.path.join(tmp_dir, "ws_tgt"),
    )
