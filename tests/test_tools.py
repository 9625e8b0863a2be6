"""Standalone tool CLIs (tools.bf / tools.ntedit / tools.sealer) — the
reference's per-stage binaries (SURVEY.md section 2: goldpolish-targeted-bfs,
ntedit-gr, sealer-gr) recomposed end-to-end."""

import numpy as np

from goldpolish_tpu.io import fasta
from goldpolish_tpu.tools import bf as bf_tool
from goldpolish_tpu.tools import ntedit as ntedit_tool
from goldpolish_tpu.tools import sealer as sealer_tool


def _fixture(tmp_path):
    rng = np.random.default_rng(11)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(6000))
    d = list(truth)
    for p in range(200, 5800, 500):
        d[p] = "ACGT"[("ACGT".index(d[p]) + 1) % 4]
    gap = list(truth)
    for p in range(3000, 3080):
        gap[p] = gap[p].lower()
    reads = str(tmp_path / "reads.fa")
    with open(reads, "w") as f:
        for rep in range(6):
            for s in range(0, 6000, 1000):
                f.write(f">r{rep}_{s}\n{truth[s:s+2000]}\n")
    draft = str(tmp_path / "draft.fa")
    open(draft, "w").write(f">c1\n{''.join(d)}\n")
    gapped = str(tmp_path / "gapped.fa")
    open(gapped, "w").write(f">g1\n{''.join(gap)}\n")
    return truth, reads, draft, gapped


def test_bf_ntedit_sealer_chain(tmp_path):
    truth, reads, draft, gapped = _fixture(tmp_path)
    prefix = str(tmp_path / "f")
    bf_tool.main([reads, "-k32", "-k28", "-o", prefix])
    polished = str(tmp_path / "polished.fa")
    changes = str(tmp_path / "ch.tsv")
    ntedit_tool.main([draft, f"{prefix}-k32.bf", polished,
                      "--changes", changes])
    out = next(iter(fasta.read_seqs(polished))).seq
    assert out.upper() == truth
    assert sum(1 for _ in open(changes)) == 12 + 1  # header + 12 subs
    sealed_path = str(tmp_path / "sealed.fa")
    trace = str(tmp_path / "trace.tsv")
    sealer_tool.main([gapped, sealed_path, "--bf", f"{prefix}-k32.bf",
                      "--bf", f"{prefix}-k28.bf", "--lower",
                      "--trace", trace])
    sealed = next(iter(fasta.read_seqs(sealed_path))).seq
    assert sealed.upper() == truth
    assert sum(1 for _ in open(trace)) >= 2  # header + the closed gap


def test_ntedit_tool_threshold_mode(tmp_path):
    truth, reads, draft, _ = _fixture(tmp_path)
    prefix = str(tmp_path / "f")
    bf_tool.main([reads, "-k32", "-o", prefix])
    out_path = str(tmp_path / "p.fa")
    ntedit_tool.main([draft, f"{prefix}-k32.bf", out_path,
                      "-x", "5.0", "-y", "9.0"])
    out = next(iter(fasta.read_seqs(out_path))).seq
    assert out.upper() == truth


def test_mask_and_to_upper_tools(tmp_path):
    from goldpolish_tpu.tools import mask as mask_tool
    from goldpolish_tpu.tools import to_upper as upper_tool

    src = str(tmp_path / "in.fa")
    # a short uppercase island between soft-masked runs gets masked too
    open(src, "w").write(
        ">x\n" + "A" * 40 + "acgta" + "CGT" + "acgta" + "A" * 40 + "\n"
    )
    masked = str(tmp_path / "m.fa")
    mask_tool.main([src, masked, "-k", "32"])
    m = next(iter(fasta.read_seqs(masked))).seq
    assert "cgt" in m and "CGT" not in m
    upped = str(tmp_path / "u.fa")
    upper_tool.main([masked, upped])
    u = next(iter(fasta.read_seqs(upped))).seq
    assert u == u.upper()


def test_ntedit_tool_secbf_walker_matches_oracle(tmp_path):
    """--secbf routes through the native walk (when available) and must
    byte-match the oracle's secondary-veto output."""
    from goldpolish_tpu.ops import bloom, nthash as nt
    from goldpolish_tpu.polish import ntedit_oracle as ne

    rng = np.random.default_rng(13)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(5000))
    d = list(truth)
    for p in range(200, 4800, 401):
        d[p] = "ACGT"[("ACGT".index(d[p]) + 1) % 4]
    draft_s = "".join(d)
    bf = bloom.BloomFilter(1 << 17, 4, 32)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), 32), 32, 4))
    sec = bloom.BloomFilter(1 << 15, 4, 32)
    sec.insert(
        nt.multi_hashes(nt.canonical_hashes(nt.encode(truth[:1500]), 32), 32, 4)
    )
    bf_path = str(tmp_path / "p.bf")
    sec_path = str(tmp_path / "s.bf")
    bf.save(bf_path)
    sec.save(sec_path)
    draft = str(tmp_path / "d.fa")
    open(draft, "w").write(f">c1\n{draft_s}\n")
    out = str(tmp_path / "o.fa")
    ntedit_tool.main([draft, bf_path, out, "--secbf", sec_path, "-m1", "-a1"])
    got = list(fasta.read_seqs(out))[0].seq
    cfg = ne.Config(k=32, h=4, use_ratio=True, mode=1, mask=1)
    want, _recs, _ed = ne.polish_contig(draft_s.encode(), bf, cfg, sec)
    assert got.encode() == want


def test_ntedit_tool_secbf_short_contig_untouched(tmp_path):
    """Contigs below min_contig_len must pass through unchanged on the
    --secbf path (the oracle's guard; the native walk has none)."""
    from goldpolish_tpu.ops import bloom, nthash as nt

    rng = np.random.default_rng(19)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(2000))
    short = truth[:80]
    mutated_short = "A" + short[1:] if short[0] != "A" else "C" + short[1:]
    bf = bloom.BloomFilter(1 << 16, 4, 32)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), 32), 32, 4))
    sec = bloom.BloomFilter(1 << 14, 4, 32)
    bf_path, sec_path = str(tmp_path / "p.bf"), str(tmp_path / "s.bf")
    bf.save(bf_path)
    sec.save(sec_path)
    draft = str(tmp_path / "d.fa")
    open(draft, "w").write(f">c1\n{mutated_short}\n>c2\n{truth}\n")
    out = str(tmp_path / "o.fa")
    ntedit_tool.main([draft, bf_path, out, "--secbf", sec_path, "-m1", "-a1"])
    got = list(fasta.read_seqs(out))
    assert got[0].seq == mutated_short  # below min_contig_len: untouched


def test_bf_tool_btllib_format_chain(tmp_path):
    """--format btllib writes the reference's KmerBloomFilter container and
    the ntedit tool consumes it via load_any — the drop-in artifact path
    (reference: bfs saved at goldpolish_targeted_bfs.cpp:139, loaded by
    ntedit-gr at ntedit.cpp:2012-2022).  Bits must equal the gptpu-format
    build's."""
    truth, reads, draft, _g = _fixture(tmp_path)
    from goldpolish_tpu.ops import bloom

    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    bf_tool.main([reads, "-k32", "-o", p1])
    bf_tool.main([reads, "-k32", "-o", p2, "--format", "btllib"])
    a = bloom.load_any(f"{p1}-k32.bf")
    b = bloom.load_any(f"{p2}-k32.bf")
    assert (b.hash_num, b.k) == (a.hash_num, a.k)
    assert bytes(b.array) == bytes(a.array)
    polished = str(tmp_path / "pol.fa")
    ntedit_tool.main([draft, f"{p2}-k32.bf", polished])
    out = next(iter(fasta.read_seqs(polished))).seq
    assert out.upper() == truth
