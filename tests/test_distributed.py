"""Multi-host primitives: batch ownership, per-batch publish + reaper."""

import os
import threading

import pytest

from goldpolish_tpu.parallel import distributed as dist


def test_host_owns_batch_round_robin():
    owners = [
        [h for h in range(3) if dist.host_owns_batch(i, h, 3)] for i in range(6)
    ]
    assert owners == [[0], [1], [2], [0], [1], [2]]


def test_write_and_reap_ordered(tmp_path):
    out = str(tmp_path / "merged.fa")
    # publish batches out of order from two "hosts"
    dist.write_batch_output(out, 2, [("c3", "GGG")])
    dist.write_batch_output(out, 0, [("c1", "AAA"), ("c1b", "CCC")])
    t = threading.Thread(target=dist.reap, args=(out, 3))
    t.start()
    dist.write_batch_output(out, 1, [("c2", "TTT")])
    t.join(timeout=30)
    assert not t.is_alive()
    from goldpolish_tpu.io import fasta

    recs = list(fasta.read_seqs(out))
    assert [r.id for r in recs] == ["c1", "c1b", "c2", "c3"]
    # per-batch files cleaned up
    assert not [f for f in os.listdir(tmp_path) if ".batch" in f]


def test_reap_aborts_on_empty_batch(tmp_path):
    out = str(tmp_path / "m.fa")
    open(dist.batch_path(out, 0), "w").close()  # empty
    with pytest.raises(RuntimeError):
        dist.reap(out, 1, timeout=5)


def test_reap_timeout(tmp_path):
    out = str(tmp_path / "m.fa")
    with pytest.raises(TimeoutError):
        dist.reap(out, 1, poll_interval=0.05, timeout=0.3)


def test_init_distributed_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert dist.init_distributed() == (0, 1)


def test_reap_resume_no_duplicate_after_crash_windows(tmp_path):
    """Every reaper crash window resumes without duplicate or lost records.

    Simulates the two dangerous windows: (a) batch appended + progress
    persisted but the batch file not yet removed; (b) a partial append with
    no progress update (output holds extra bytes past the recorded offset).
    """
    from goldpolish_tpu.io import fasta

    out = str(tmp_path / "m.fa")
    for i in range(4):
        dist.write_batch_output(out, i, [(f"c{i}", "ACGT" * (i + 1))])
    # reap batches 0..1 normally, then restore the progress file a crashed
    # run would have left behind (reap removes it only on full completion)
    dist.reap(out, 2, resumable=True)
    progress = dist.reap_progress_path(out)
    with open(progress, "w") as f:
        f.write(f"2 {os.path.getsize(out)}")
    assert dist.reaped_through(out) == 2
    # window (a): re-publish batch 1 as if removed-after-progress crashed
    dist.write_batch_output(out, 1, [("c1", "ACGTACGT")])
    # window (b): partial append of batch 2 beyond the recorded offset
    with open(out, "a") as f:
        f.write(">c2 partial\nACG")  # torn write
    dist.reap(out, 4, resumable=True)
    recs = list(fasta.read_seqs(out))
    assert [r.id for r in recs] == ["c0", "c1", "c2", "c3"]
    assert [r.seq for r in recs] == ["ACGT" * (i + 1) for i in range(4)]
    assert not os.path.exists(progress)  # removed on completion


def test_manifest_mark_idempotent(tmp_path):
    from goldpolish_tpu.pipeline.engine import CheckpointManifest

    path = str(tmp_path / "manifest.jsonl")
    m = CheckpointManifest(path)
    m.mark(3)
    m.mark(3)  # re-polished batch must not duplicate the line
    m.close()
    with open(path) as f:
        lines = f.readlines()
    assert len(lines) == 1
