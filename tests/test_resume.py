"""Checkpoint/resume: done batches replay from disk, never re-polish."""

import json
import os

import numpy as np
import pytest

from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.parallel import distributed as dist
from goldpolish_tpu.pipeline import bulk


def _scenario(tmp_path, n_contigs=6, contig_len=4000, coverage=8):
    rng = np.random.default_rng(3)
    truths = [
        "".join(rng.choice(list("ACGT"), contig_len)) for _ in range(n_contigs)
    ]
    draft_path = str(tmp_path / "draft.fa")
    reads_path = str(tmp_path / "reads.fa")
    paf_path = str(tmp_path / "map.paf")
    with open(draft_path, "w") as d:
        for i, t in enumerate(truths):
            s = list(t)
            s[contig_len // 2] = "A" if s[contig_len // 2] != "A" else "C"
            d.write(f">ctg{i}\n{''.join(s)}\n")
    rid = 0
    with open(reads_path, "w") as r, open(paf_path, "w") as p:
        for i, t in enumerate(truths):
            for c in range(coverage):
                off = (c * 131) % 400
                seq = t[off:] + t[:off]  # rotations keep k-mer coverage high
                seq = t  # full-length perfect reads, offset irrelevant
                r.write(f">r{rid}\n{seq}\n")
                p.write(
                    f"r{rid}\t{len(seq)}\t0\t{len(seq)}\t+\tctg{i}\t"
                    f"{contig_len}\t0\t{contig_len}\t{contig_len}\t"
                    f"{contig_len}\t60\n"
                )
                rid += 1
    return draft_path, reads_path, paf_path


def _cfg(tmp_path, draft, reads, paf, out_name, ckpt=None):
    return PipelineConfig(
        seqs_to_polish=draft,
        polishing_seqs=reads,
        output_seqs=str(tmp_path / out_name),
        mappings_path=paf,
        k_values=[32, 28],
        batch_size=2,
        run_sealer=False,
        workspace=str(tmp_path / "ws"),
        checkpoint=ckpt,
    )


def test_single_host_resume_skips_done_batches(tmp_path):
    draft, reads, paf = _scenario(tmp_path)
    # reference run (no checkpoint)
    bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "ref.fa"))
    ref = open(tmp_path / "ref.fa").read()

    # simulate a preempted run: batch 0 done + checkpointed with SENTINEL
    # content (proves the resume replays the file instead of re-polishing)
    ckpt = str(tmp_path / "ckpt.jsonl")
    ckpt_dir = ckpt + ".batches"
    os.makedirs(ckpt_dir)
    with open(ckpt, "w") as f:
        f.write(json.dumps({"batch": 0}) + "\n")
    sentinel = [("ctg0 SENTINEL", "ACGT" * 8), ("ctg1 SENTINEL", "TTTT" * 8)]
    dist.write_batch_output(os.path.join(ckpt_dir, "out"), 0, sentinel)

    stats = bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "res.fa", ckpt))
    res = open(tmp_path / "res.fa").read()
    assert stats["resumed_batches"] == 1
    assert res.startswith(">ctg0 SENTINEL\n")  # batch 0 NOT re-polished
    # batches 1.. byte-identical to the reference run
    ref_tail = ref.split(">ctg2")[1]
    res_tail = res.split(">ctg2")[1]
    assert res_tail == ref_tail
    # completion cleans the checkpoint state
    assert not os.path.exists(ckpt)
    assert not os.path.exists(ckpt_dir)


def test_resume_declines_when_replay_file_missing(tmp_path):
    draft, reads, paf = _scenario(tmp_path)
    bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "ref.fa"))
    ref = open(tmp_path / "ref.fa").read()

    ckpt = str(tmp_path / "ckpt.jsonl")
    with open(ckpt, "w") as f:
        f.write(json.dumps({"batch": 0}) + "\n")  # done but no file
    stats = bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "res.fa", ckpt))
    assert stats["resumed_batches"] == 0
    assert open(tmp_path / "res.fa").read() == ref  # re-polished correctly


def test_reaper_resumes_from_progress(tmp_path):
    out = str(tmp_path / "out.fa")
    batches = [[(f"b{i}", "ACGT" * (i + 1))] for i in range(4)]
    # first run reaps batches 0-1 then "dies"
    for i in (0, 1):
        dist.write_batch_output(out, i, batches[i])
    dist.reap(out, 2, resumable=True)
    # progress file was removed on completion of n=2; simulate mid-run death
    with open(dist.reap_progress_path(out), "w") as f:
        f.write("2")
    assert dist.reaped_through(out) == 2
    for i in (2, 3):
        dist.write_batch_output(out, i, batches[i])
    dist.reap(out, 4, resumable=True)
    text = open(out).read()
    assert text == "".join(f">b{i}\n{'ACGT' * (i + 1)}\n" for i in range(4))
    assert not os.path.exists(dist.reap_progress_path(out))
    assert dist.reaped_through(out) == 0


@pytest.mark.slow
def test_sigkill_midrun_resume_byte_identical(tmp_path):
    """Kill a checkpointed run with SIGKILL mid-way, resume, and require
    output byte-identical to an uninterrupted run with no batch re-polished
    twice (the manifest marks only AFTER the replay file is published)."""
    import signal
    import subprocess
    import sys
    import time

    draft, reads, paf = _scenario(tmp_path, n_contigs=10, contig_len=6000,
                                  coverage=10)
    ref_out = str(tmp_path / "ref.fa")
    bulk.run_bulk(_cfg2(tmp_path, draft, reads, paf, ref_out))
    ref = open(ref_out).read()

    out = str(tmp_path / "res.fa")
    ckpt = str(tmp_path / "ck.jsonl")
    # subprocess run with each batch slowed so the kill lands mid-run
    script = f"""
import sys, time
sys.path.insert(0, {os.getcwd()!r})
import jax
jax.config.update("jax_platforms", "cpu")
from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.pipeline import bulk
import goldpolish_tpu.pipeline.bulk as B
_orig = B.polish_batch_records
def slow(records, builder, cfg, batch_bfs=None):
    time.sleep(0.35)
    return _orig(records, builder, cfg, batch_bfs)
B.polish_batch_records = slow
cfg = PipelineConfig(
    seqs_to_polish={draft!r}, polishing_seqs={reads!r},
    output_seqs={out!r}, mappings_path={paf!r},
    k_values=[32, 28], batch_size=1, run_sealer=False,
    workspace={str(tmp_path / 'wsk')!r}, checkpoint={ckpt!r},
    max_concurrent_batches=2,
)
bulk.run_bulk(cfg)
"""
    p = subprocess.Popen([sys.executable, "-c", script])
    # kill once the manifest shows real progress (mid-run by construction:
    # batches take 0.35s each, so the run cannot finish between the check
    # and the SIGKILL)
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.exists(ckpt) and len(
            open(ckpt).read().strip().splitlines()
        ) >= 2:
            break
        time.sleep(0.05)
        if p.poll() is not None:
            break
    p.send_signal(signal.SIGKILL)
    p.wait()
    done_before = 0
    if os.path.exists(ckpt):
        done_before = len(open(ckpt).read().strip().splitlines())
    assert 2 <= done_before < 10, done_before  # the kill landed MID-run
    # resume in-process (no slowdown)
    stats = bulk.run_bulk(_cfg2(tmp_path, draft, reads, paf, out, ckpt))
    assert stats["resumed_batches"] == done_before  # nothing re-polished
    assert open(out).read() == ref
    assert not os.path.exists(ckpt)  # completed run cleaned its state


def _cfg2(tmp_path, draft, reads, paf, out, ckpt=None):
    return PipelineConfig(
        seqs_to_polish=draft, polishing_seqs=reads, output_seqs=out,
        mappings_path=paf, k_values=[32, 28], batch_size=1, run_sealer=False,
        workspace=str(tmp_path / "ws2"), checkpoint=ckpt,
        max_concurrent_batches=2,
    )


def test_resume_lookahead_never_prefills_done_batches(tmp_path, monkeypatch):
    """A checkpoint-done batch replays from disk; neither the on-demand
    fill nor the lookahead may build its filters (the pre-fix lookahead
    filled batch N+1 even when N+1 was recorded done — wasted work whose
    unconsumed future pinned filters and, on the device claimer, parked
    the fill thread; review r4)."""
    draft, reads, paf = _scenario(tmp_path)
    bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "ref.fa"))
    ref = open(tmp_path / "ref.fa").read()

    ckpt = str(tmp_path / "ckpt.jsonl")
    ckpt_dir = ckpt + ".batches"
    os.makedirs(ckpt_dir)
    with open(ckpt, "w") as f:
        f.write(json.dumps({"batch": 1}) + "\n")
    sentinel = [("ctg2 SENTINEL", "ACGT" * 8), ("ctg3 SENTINEL", "TTTT" * 8)]
    dist.write_batch_output(os.path.join(ckpt_dir, "out"), 1, sentinel)

    fills: list = []
    orig = bulk.build_batch_bfs

    def counting(builder, cfg, ids):
        fills.append(tuple(ids))
        return orig(builder, cfg, ids)

    monkeypatch.setattr(bulk, "build_batch_bfs", counting)
    stats = bulk.run_bulk(_cfg(tmp_path, draft, reads, paf, "res.fa", ckpt))
    res = open(tmp_path / "res.fa").read()
    assert stats["resumed_batches"] == 1
    assert ">ctg2 SENTINEL\n" in res  # replayed, not re-polished
    # exactly the two live batches filled — batch 1 never pre-filled
    assert sorted(fills) == [("ctg0", "ctg1"), ("ctg4", "ctg5")]
    # live batches byte-identical to the reference run
    assert res.split(">ctg2")[0] == ref.split(">ctg2")[0]
    assert res.split(">ctg4")[1] == ref.split(">ctg4")[1]
