"""ntHash correctness: closed-form batched hashes vs. the scalar recurrences.

The scalar functions are direct transliterations of the reference recurrences
(reference: subprojects/ntedit/lib/nthash.hpp); the closed-form prefix-XOR
formulation must agree bit-for-bit on every window, every k, including
sequences with non-ACGT/IUPAC/lowercase bytes.
"""

import numpy as np
import pytest

from goldpolish_tpu.ops import nthash as nt


def _random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


@pytest.mark.parametrize("k", [4, 20, 24, 28, 32, 33, 64])
def test_forward_reverse_closed_form_matches_rolling(k):
    rng = np.random.default_rng(k)
    n = 300
    codes = nt.encode(
        "".join("ACGTacgtNRYSWKMBDHVn"[i] for i in rng.integers(0, 20, n))
    )
    f_all = nt.forward_hashes(codes, k)
    r_all = nt.reverse_hashes(codes, k)
    # scalar rolling chain
    fh = nt.ntf64_base(codes, k)
    rh = nt.ntr64_base(codes, k)
    assert f_all[0] == fh and r_all[0] == rh
    for w in range(1, n - k + 1):
        fh, rh, _ = nt.ntc64_roll(fh, rh, k, int(codes[w - 1]), int(codes[w + k - 1]))
        assert f_all[w] == fh, f"forward mismatch at window {w}"
        assert r_all[w] == rh, f"reverse mismatch at window {w}"


def test_canonical_is_strand_symmetric():
    # canonical hash of a k-mer == canonical hash of its reverse complement
    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.default_rng(0)
    for k in (5, 32):
        s = _random_seq(rng, k)
        rc = s.translate(comp)[::-1]
        _, _, h1 = nt.ntc64_base(nt.encode(s), k)
        _, _, h2 = nt.ntc64_base(nt.encode(rc), k)
        assert h1 == h2


def test_changelast_matches_recompute():
    rng = np.random.default_rng(1)
    k = 32
    s = _random_seq(rng, k)
    codes = nt.encode(s)
    fh, rh, _ = nt.ntc64_base(codes, k)
    for new_base in "ACGT":
        if new_base == s[-1]:
            continue
        s2 = s[:-1] + new_base
        fh2, rh2, h2 = nt.ntc64_changelast(fh, rh, k, ord(s[-1]), ord(new_base))
        efh, erh, eh = nt.ntc64_base(nt.encode(s2), k)
        assert (fh2, rh2, h2) == (efh, erh, eh)


def test_multi_hashes_formula():
    k, m = 32, 4
    b = np.uint64(0x0123456789ABCDEF)
    hs = nt.multi_hashes(b, k, m)
    assert hs[0] == b
    for i in range(1, m):
        t = (
            int(b) * (i ^ ((k * int(nt.MULTI_SEED)) & nt.MASK64))
        ) & nt.MASK64
        t ^= t >> nt.MULTI_SHIFT
        assert int(hs[i]) == t


def test_srol_period():
    v = np.uint64(0x0123456789ABCDEF)
    x = v
    for _ in range(nt.SROL_PERIOD):
        x = nt.srol(x)
    assert x == v
    assert nt.srol_n(v, 1) == nt.srol(v)
    assert nt.sror(nt.srol(v)) == v


def test_empty_and_short():
    assert len(nt.forward_hashes(nt.encode("ACG"), 5)) == 0
    assert len(nt.canonical_hashes(nt.encode("ACGTA"), 5)) == 1


def test_changefirst_scalar():
    """ntc64_changefirst_i == reseed of the first-base-swapped k-mer."""
    rng = np.random.default_rng(7)
    for k in (32, 28, 20):
        s = "".join(rng.choice(list("ACGT")) for _ in range(k))
        seq = bytearray(s.encode())
        fh, rh = nt.ntc64_base_i(seq, 0, k)
        for b in b"ACGT":
            want_seq = bytearray(bytes([b]) + seq[1:])
            want = nt.ntc64_base_i(want_seq, 0, k)
            got = nt.ntc64_changefirst_i(fh, rh, k, seq[0], b)
            assert got == want, (k, chr(b))
