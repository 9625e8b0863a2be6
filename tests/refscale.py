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


def _simulate_noisy_reads(truths, reads_path, paf_path, rng, frag=6000,
                          step=1500, passes=8, err_rate=0.07):
    """ONT-like degraded reads: ~err_rate errors per base, indel-heavy
    (40% sub / 30% ins / 30% del, deletions biased into homopolymer runs
    — the dominant ONT error mode).  Deterministic in rng.  Mirrors the
    realism of the reference e2e test's real ONT reads
    (tests/goldpolish_test.sh:6 — downloaded; zero egress here) as far as
    a simulator allows: masked clusters and unfixable sites dominate the
    polish, unlike the clean-read fixtures."""
    bases = np.frombuffer(b"ACGT", np.uint8)

    def corrupt(seq: str) -> str:
        s = np.frombuffer(seq.encode(), np.uint8).copy()
        n = len(s)
        n_err = int(rng.binomial(n, err_rate))
        if not n_err:
            return seq
        pos = np.sort(rng.choice(n, size=min(n_err, n), replace=False))
        kinds = rng.random(len(pos))
        ins_char = bases[rng.integers(0, 4, len(pos))]
        sub_off = rng.integers(1, 4, len(pos))
        out = []
        prev = 0
        for p, kind, ic, so in zip(pos, kinds, ins_char, sub_off):
            p = int(p)
            if p < prev:
                # consumed by a previous deletion's homopolymer snap —
                # processing it would re-emit already-written bases
                continue
            out.append(s[prev:p])
            if kind < 0.4:  # substitution
                code = {65: 0, 67: 1, 71: 2, 84: 3}.get(int(s[p]))
                if code is None:
                    out.append(s[p : p + 1])
                else:
                    out.append(bases[(code + int(so)) % 4 : (code + int(so)) % 4 + 1])
                prev = p + 1
            elif kind < 0.7:  # insertion
                out.append(np.array([ic], np.uint8))
                out.append(s[p : p + 1])
                prev = p + 1
            else:  # deletion, snapped into a homopolymer run when adjacent
                q = p
                while q + 1 < n and s[q + 1] == s[q]:
                    q += 1
                out.append(s[p:q])
                prev = q + 1
        out.append(s[prev:])
        return np.concatenate(out).tobytes().decode()

    with open(reads_path, "w") as rf, open(paf_path, "w") as pf:
        rn = 0
        for rep in range(passes):
            off = rep * step // passes
            for name, t in truths:
                cid = name.split()[0]
                n = len(t)
                starts = [0] if off else []
                starts += list(range(off, n, step))
                for s in starts:
                    e = min(n, s + frag)
                    if e - s < 400:
                        continue
                    r = corrupt(t[s:e])
                    rf.write(f"@r{rn}\n{r}\n+\n{'I' * len(r)}\n")
                    pf.write(
                        f"r{rn}\t{len(r)}\t0\t{len(r)}\t+\t{cid}\t{n}\t{s}\t"
                        f"{e}\t{min(len(r), e - s)}\t{e - s}\t60\n"
                    )
                    rn += 1


def build_bulk_noisy_inputs(tmp_dir: str):
    """Bulk-mode inputs with DEGRADED reads (7% indel-heavy errors) over a
    ~300 kb subset of the bundled draft — the regime where masked clusters
    dominate (round-1 note: real noisy batches present this way)."""
    from goldpolish_tpu.config import PipelineConfig
    from goldpolish_tpu.io import fasta

    rng = np.random.default_rng(SEED + 2)
    truths_all = _read_fasta(REF_BULK_DRAFT)
    truths = []
    total = 0
    for name, t in truths_all:
        truths.append((name, t))
        total += len(t)
        if total >= 300_000:
            break
    drafts = _mutate(truths, rng)
    draft_path = os.path.join(tmp_dir, "noisy_draft.fa")
    fasta.write_fasta(draft_path, drafts)
    reads_path = os.path.join(tmp_dir, "noisy_reads.fq")
    paf_path = os.path.join(tmp_dir, "noisy_map.paf")
    _simulate_noisy_reads(truths, reads_path, paf_path, rng)
    return PipelineConfig(
        seqs_to_polish=draft_path,
        polishing_seqs=reads_path,
        output_seqs=os.path.join(tmp_dir, "noisy_polished.fa"),
        mappings_path=paf_path,
        k_values=[32, 28, 24, 20],
        batch_size=16,
        run_sealer=True,
        workspace=os.path.join(tmp_dir, "ws_noisy"),
        max_concurrent_batches=2,
    )


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
