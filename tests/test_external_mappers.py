"""Stub-executable coverage for the ntLink/minimap2 subprocess paths.

`bulk.resolve_mappings` and `targeted._run_external_mapper` shell out to
real mappers when they are on PATH (reference: scripts/goldpolish:204-295,
goldpolish-target-run-pipeline.smk:49-78).  These tests install fake
`minimap2`/`ntLink` executables that emit precomputed mappings, then pin:

 * argument plumbing (exact argv the subprocess receives),
 * artifact naming in the CWD (the reference's make-target names),
 * mtime-based artifact reuse (the make DAG's .SECONDARY resumability),
 * byte-identical final FASTA vs the equivalent --mappings run,
 * the cross-filesystem workspace case (EXDEV regression: mapping tmp
   files must be created next to their destination, not in the
   workspace).
"""

import os
import shutil

import pytest

from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.pipeline import bulk, targeted

from test_pipeline import _write_synthetic


def _install_stub(tmp_path, monkeypatch, name: str, body: str) -> str:
    """Drop an executable shell stub onto PATH; return its argv-log path."""
    bin_dir = tmp_path / "stub_bin"
    bin_dir.mkdir(exist_ok=True)
    argv_log = str(bin_dir / f"{name}.argv")
    p = bin_dir / name
    p.write_text(f'#!/bin/sh\necho "$@" > {argv_log}\n{body}\n')
    p.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    return argv_log


def _bulk_cfg(draft, reads, out, tmp_path, **kw):
    return PipelineConfig(
        seqs_to_polish=draft, polishing_seqs=reads, output_seqs=out,
        k_values=[32, 28], batch_size=2, workspace=str(tmp_path),
        max_concurrent_batches=2, **kw,
    )


def _reference_output(tmp_path, draft, reads, paf) -> bytes:
    """Polish once with --mappings; the byte baseline for the stub runs."""
    out = str(tmp_path / "ref_polished.fa")
    bulk.run_bulk(_bulk_cfg(draft, reads, out, tmp_path, mappings_path=paf))
    with open(out, "rb") as f:
        return f.read()


def test_bulk_minimap2_stub(tmp_path, monkeypatch):
    draft, reads, paf, _ = _write_synthetic(tmp_path, n_contigs=2,
                                            contig_len=2000, coverage=10)
    expected = _reference_output(tmp_path, draft, reads, paf)

    argv_log = _install_stub(tmp_path, monkeypatch, "minimap2",
                             f"cat {paf}")
    cwd = tmp_path / "m2_cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    out = str(tmp_path / "m2_polished.fa")
    bulk.run_bulk(_bulk_cfg(draft, reads, out, tmp_path, mapper="minimap2",
                            threads=2))

    # argv plumbing (reference invocation: minimap2 -t<t> <target> <reads>)
    with open(argv_log) as f:
        assert f.read().split() == ["-t2", draft, reads]
    # artifact name in CWD (reference: <draft>.<reads>.paf)
    artifact = cwd / f"{os.path.basename(draft)}.{os.path.basename(reads)}.paf"
    assert artifact.exists()
    with open(out, "rb") as f:
        assert f.read() == expected

    # mtime reuse: a rerun must NOT re-invoke the mapper (make .SECONDARY)
    os.unlink(argv_log)
    out2 = str(tmp_path / "m2_polished2.fa")
    bulk.run_bulk(_bulk_cfg(draft, reads, out2, tmp_path, mapper="minimap2",
                            threads=2))
    assert not os.path.exists(argv_log)
    with open(out2, "rb") as f:
        assert f.read() == expected


def test_bulk_ntlink_stub(tmp_path, monkeypatch):
    from goldpolish_tpu import mapper as internal_mapper

    draft, reads, paf, _ = _write_synthetic(tmp_path, n_contigs=2,
                                            contig_len=2000, coverage=10)
    # precompute an ntLink-format mapping TSV (the internal mapper emits
    # the compatible 3-column format) that the stub will "produce"
    tsv = str(tmp_path / "precomputed.mapping.tsv")
    internal_mapper.write_mapping_tsv(draft, reads, tsv)
    expected = _reference_output(tmp_path, draft, reads, tsv)

    artifact_name = f"{os.path.basename(draft)}.k88.w1000.z1000.mapping.tsv"
    argv_log = _install_stub(tmp_path, monkeypatch, "ntLink",
                             f"cp {tsv} {artifact_name}")
    cwd = tmp_path / "ntlink_cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    out = str(tmp_path / "ntlink_polished.fa")
    bulk.run_bulk(_bulk_cfg(draft, reads, out, tmp_path, mapper="ntlink",
                            threads=2))

    with open(argv_log) as f:
        assert f.read().split() == [
            "t=2", f"target={draft}", f"reads={reads}", "pair",
            "verbose=True", "k=88", "w=1000", "sensitive=True",
        ]
    assert (cwd / artifact_name).exists()
    with open(out, "rb") as f:
        assert f.read() == expected


@pytest.mark.skipif(not os.path.isdir("/dev/shm"), reason="no /dev/shm")
def test_bulk_internal_mapper_cross_filesystem_workspace(tmp_path, monkeypatch):
    """EXDEV regression: workspace on a different filesystem than the CWD
    where mapping artifacts land — tmp files must be created next to the
    destination so os.replace never crosses a mount."""
    assert shutil.which("ntLink") is None  # no stub: internal fallback path
    draft, reads, paf, _ = _write_synthetic(tmp_path, n_contigs=2,
                                            contig_len=2000, coverage=10)
    cwd = tmp_path / "int_cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    shm_ws = f"/dev/shm/gp_exdev_test_{os.getpid()}"
    os.makedirs(shm_ws, exist_ok=True)
    try:
        out = str(tmp_path / "int_polished.fa")
        cfg = PipelineConfig(
            seqs_to_polish=draft, polishing_seqs=reads, output_seqs=out,
            k_values=[32, 28], batch_size=2, workspace=shm_ws,
            max_concurrent_batches=2,
        )
        bulk.run_bulk(cfg)
        artifact = (
            cwd / f"{os.path.basename(draft)}."
                  f"{os.path.basename(reads)}.internal.mapping.tsv"
        )
        assert artifact.exists()
        assert os.path.getsize(out) > 0
    finally:
        shutil.rmtree(shm_ws, ignore_errors=True)


def _targeted_inputs(tmp_path):
    import numpy as np

    from goldpolish_tpu.io import fasta

    rng = np.random.default_rng(0)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(4000))
    d = list(truth)
    d[1900] = "A" if d[1900] != "A" else "C"
    draft_sm = (
        "".join(d[:1000]) + "".join(d[1000:3000]).lower() + "".join(d[3000:])
    )
    draft = str(tmp_path / "draft.fa")
    fasta.write_fasta(draft, [fasta.SeqRecord("ctgA", "", draft_sm)])
    reads = str(tmp_path / "reads.fq")
    paf = str(tmp_path / "map.paf")
    frag, step = 1200, 600
    with open(reads, "w") as rf, open(paf, "w") as pf:
        rn = 0
        for _ in range(8):
            for s in range(0, 4000, step):
                e = min(4000, s + frag)
                if e - s < 300:
                    continue
                rf.write(f"@r{rn}\n{truth[s:e]}\n+\n{'I' * (e - s)}\n")
                pf.write(
                    f"r{rn}\t{e-s}\t0\t{e-s}\t+\tctgA\t4000\t{s}\t{e}\t"
                    f"{e-s}\t{e-s}\t60\n"
                )
                rn += 1
    return draft, reads, paf, truth


def _targeted_cfg(draft, reads, out, tmp_path, **kw):
    return PipelineConfig(
        seqs_to_polish=draft, polishing_seqs=reads, output_seqs=out,
        k_values=[32, 28], target=True, flank_length=64,
        workspace=str(tmp_path), **kw,
    )


def test_targeted_minimap2_stub(tmp_path, monkeypatch):
    draft, reads, paf, truth = _targeted_inputs(tmp_path)
    ref_out = str(tmp_path / "ref_out.fa")
    targeted.run_targeted(
        _targeted_cfg(draft, reads, ref_out, tmp_path, mappings_path=paf)
    )
    with open(ref_out, "rb") as f:
        expected = f.read()

    argv_log = _install_stub(tmp_path, monkeypatch, "minimap2", f"cat {paf}")
    cwd = tmp_path / "t_m2_cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    out = str(tmp_path / "t_m2_out.fa")
    targeted.run_targeted(
        _targeted_cfg(draft, reads, out, tmp_path, mapper="minimap2",
                      threads=2)
    )
    with open(argv_log) as f:
        assert f.read().split() == ["-t2", draft, reads]
    assert (cwd / f"{os.path.basename(draft)}.targeted.paf").exists()
    with open(out, "rb") as f:
        assert f.read() == expected


def test_targeted_ntlink_stub(tmp_path, monkeypatch):
    draft, reads, paf, truth = _targeted_inputs(tmp_path)
    ref_out = str(tmp_path / "ref_out.fa")
    targeted.run_targeted(
        _targeted_cfg(draft, reads, ref_out, tmp_path, mappings_path=paf)
    )
    with open(ref_out, "rb") as f:
        expected = f.read()

    # ntLink's targeted invocation (paf=True) writes next to the draft,
    # not the CWD (reference smk:49-78 artifact naming)
    artifact = f"{draft}.k88.w1000.z1000.paf"
    argv_log = _install_stub(tmp_path, monkeypatch, "ntLink",
                             f"cp {paf} {artifact}")
    cwd = tmp_path / "t_nl_cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    out = str(tmp_path / "t_nl_out.fa")
    targeted.run_targeted(
        _targeted_cfg(draft, reads, out, tmp_path, mapper="ntlink",
                      threads=2)
    )
    with open(argv_log) as f:
        assert f.read().split() == [
            "pair", f"target={draft}", f"reads={reads}", "sensitive=True",
            "dev=True", "k=88", "w=1000", "t=2", "paf=True",
        ]
    assert os.path.exists(artifact)
    with open(out, "rb") as f:
        assert f.read() == expected
