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
