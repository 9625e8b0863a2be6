"""Differential tests for the full native editing walk (gp_polish_contig).

The walker is a C port of the exact oracle editor (the engine routes
through it by default); these tests pin it against the oracle directly on
the walker-specific surfaces: all modes, the secondary (repeat) Bloom
filter veto, the present[]-assisted clean-run fast path, and output/record
buffer growth.
"""

import numpy as np
import pytest

from goldpolish_tpu.ops import bloom, nthash as nt, siteeval
from goldpolish_tpu.polish import ntedit_oracle as ne

try:
    from goldpolish_tpu import native

    native.lib()
    HAVE_NATIVE = True
except Exception:  # noqa: BLE001
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib absent")

K, H = 32, 4


def _bf_from(truth: str, bytes_size=1 << 17):
    bf = bloom.BloomFilter(bytes_size, H, K)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), K), K, H))
    return bf


def _mutated(rng, n=8000, n_err=24, kinds="sid"):
    truth = "".join(rng.choice(list("ACGT")) for _ in range(n))
    draft = list(truth)
    positions = sorted(
        rng.choice(np.arange(K, n - K), n_err, replace=False)
    )[::-1]
    for i, p in enumerate(positions):
        kind = kinds[i % len(kinds)]
        if kind == "s":
            draft[p] = "ACGT"[("ACGT".index(draft[p]) + 1 + int(rng.integers(3))) % 4]
        elif kind == "i":
            draft.insert(p, str(rng.choice(list("ACGT"))))
        else:
            del draft[p]
    return truth, "".join(draft).encode()


def _tables(cfg):
    return siteeval.make_tables(cfg.k, cfg.jump, cfg.max_insertions, cfg.max_deletions)


@pytest.mark.parametrize("mode", [0, 1, 2])
@pytest.mark.parametrize("mask", [0, 1])
@pytest.mark.slow
def test_walker_matches_oracle_modes(mode, mask):
    rng = np.random.default_rng(mode * 2 + mask)
    truth, draft = _mutated(rng)
    bf = _bf_from(truth)
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=mode, mask=mask)
    out_o, recs_o, ed_o = ne.polish_contig(draft, bf, cfg)
    out_n, recs_n, ed_n = native.polish_contig(draft, bf, cfg, _tables(cfg))
    assert out_n == out_o
    assert recs_n == recs_o
    assert (ed_n.n_subs, ed_n.n_ins, ed_n.n_dels, ed_n.n_masked, ed_n.n_nofix) == (
        ed_o.n_subs, ed_o.n_ins, ed_o.n_dels, ed_o.n_masked, ed_o.n_nofix,
    )


def test_walker_secondary_bf_matches():
    """The repeat-BF veto (probe = primary and not secondary) must match the
    oracle's _probe_fr semantics, including trials vetoed into rejection."""
    rng = np.random.default_rng(7)
    truth, draft = _mutated(rng, n_err=30)
    bf = _bf_from(truth)
    # secondary BF holding a slice of the truth k-mers: those probes veto
    sec = bloom.BloomFilter(1 << 15, H, K)
    sec.insert(
        nt.multi_hashes(nt.canonical_hashes(nt.encode(truth[:2000]), K), K, H)
    )
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1)
    out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg, bloomrep=sec)
    out_n, recs_n, _ = native.polish_contig(
        draft, bf, cfg, _tables(cfg), bloomrep=sec
    )
    assert out_n == out_o
    assert recs_n == recs_o


def test_walker_present_hint_matches():
    """A device/host-precomputed present[] must not change the result (it is
    consumed only where provably valid: unmutated windows in the trailing
    pure-draft rope node)."""
    rng = np.random.default_rng(11)
    truth, draft = _mutated(rng, n=12000, n_err=40)
    bf = _bf_from(truth, 1 << 18)
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1)
    codes = np.frombuffer(draft, np.uint8)
    present = bf.contains(
        nt.multi_hashes(nt.canonical_hashes(codes, K), K, H)
    )
    out_bare, recs_bare, _ = native.polish_contig(draft, bf, cfg, _tables(cfg))
    out_hint, recs_hint, _ = native.polish_contig(
        draft, bf, cfg, _tables(cfg), present=present
    )
    out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg)
    assert out_bare == out_o and recs_bare == recs_o
    assert out_hint == out_o and recs_hint == recs_o


@pytest.mark.slow
def test_walker_record_buffer_growth():
    """More substitution records than the initial 4096-row buffer: the
    wrapper must retry with a bigger buffer and return every record."""
    rng = np.random.default_rng(3)
    n = 400_000
    truth = "".join(rng.choice(list("ACGT")) for _ in range(n))
    bf = _bf_from(truth, 1 << 20)
    draft = list(truth)
    for p in range(K, n - K, 64):  # ~6200 substitutions
        draft[p] = "ACGT"[("ACGT".index(draft[p]) + 1) % 4]
    draft_b = "".join(draft).encode()
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1)
    out_n, recs_n, ed_n = native.polish_contig(draft_b, bf, cfg, _tables(cfg))
    assert len(recs_n) > 4096
    assert ed_n.n_subs == len(recs_n)
    out_o, recs_o, _ = ne.polish_contig(draft_b, bf, cfg)
    assert out_n == out_o
    assert recs_n == recs_o


def test_walker_lowercase_and_iupac():
    rng = np.random.default_rng(5)
    truth, draft = _mutated(rng, n=6000, n_err=18)
    # sprinkle lowercase and IUPAC codes into the draft
    d = bytearray(draft)
    for p in range(100, len(d) - 100, 257):
        d[p] = ord("acgt"[p % 4])
    for p in range(150, len(d) - 100, 701):
        d[p] = ord("RYSWKM"[p % 6])
    draft = bytes(d)
    bf = _bf_from(truth)
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1)
    out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg)
    out_n, recs_n, _ = native.polish_contig(draft, bf, cfg, _tables(cfg))
    assert out_n == out_o
    assert recs_n == recs_o


def test_walker_randomized_config_soak():
    """Randomized configs: k/h variants, jump 2-4, x/y vs X/Y accept modes,
    reduced indel caps, FP-heavy filters, IUPAC noise, lowercase stretches —
    walker must match the oracle byte-for-byte on every one."""
    rng = np.random.default_rng(123)
    for trial in range(15):
        k = int(rng.choice([20, 24, 28, 32, 40]))
        h = int(rng.choice([3, 4, 5]))
        n = int(rng.integers(2000, 6000))
        truth = "".join(rng.choice(list("ACGT"), n))
        bf = bloom.BloomFilter(int(rng.choice([1 << 15, 1 << 17])), h, k)
        bf.insert(
            nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), k), k, h)
        )
        d = list(truth)
        n_err = int(rng.integers(5, 30))
        for p in sorted(
            rng.choice(np.arange(k, n - k), n_err, replace=False)
        )[::-1]:
            kind = int(rng.integers(0, 4))
            if kind == 0:
                d[p] = "ACGT"[int(rng.integers(4))]
            elif kind == 1:
                d[p] = ""
            elif kind == 2:
                d.insert(p, "ACGT"[int(rng.integers(4))])
            else:
                d[p] = "RYKMN"[int(rng.integers(5))]
        if rng.random() < 0.5:
            a = int(rng.integers(0, n // 2))
            b = a + int(rng.integers(20, 200))
            for i in range(a, min(b, len(d))):
                if d[i]:
                    d[i] = d[i].lower()
        draft = "".join(d).encode()
        cfg = ne.Config(
            k=k, h=h,
            use_ratio=bool(rng.integers(2)),
            mode=int(rng.choice([0, 1, 2])),
            mask=int(rng.integers(2)),
            max_insertions=int(rng.choice([1, 3, 5])),
            max_deletions=int(rng.choice([1, 3, 5])),
            missing_threshold=float(rng.choice([3.0, 5.0, 9.0])),
            edit_threshold=float(rng.choice([6.0, 9.0])),
            jump=int(rng.choice([2, 3, 4])),
        )
        out_o, recs_o, ed_o = ne.polish_contig(draft, bf, cfg)
        out_n, recs_n, ed_n = native.polish_contig(draft, bf, cfg, _tables(cfg))
        assert out_n == out_o, (trial, k, h, cfg.mode)
        assert recs_n == recs_o, (trial,)
        assert (ed_n.n_subs, ed_n.n_ins, ed_n.n_dels, ed_n.n_masked) == (
            ed_o.n_subs, ed_o.n_ins, ed_o.n_dels, ed_o.n_masked,
        )


@pytest.mark.slow
def test_walker_repeat_guard_heavy():
    """Low-complexity runs (homopolymers, dinucleotide repeats) with indel
    errors inside them drive the repeat-insertion guard — including the
    multi-rollback prepend loop (the oracle keeps scanning after a repeat
    hit; reference ntedit.cpp:1071-1100 has no break)."""
    rng = np.random.default_rng(17)
    for trial in range(8):
        parts = []
        n = 0
        while n < 4000:
            if rng.random() < 0.3:
                unit = ["A", "AT", "AG", "CT", "AAT"][int(rng.integers(5))]
                run = unit * int(rng.integers(10, 40))
                parts.append(run)
            else:
                parts.append("".join(rng.choice(list("ACGT"), 200)))
            n += len(parts[-1])
        truth = "".join(parts)[:4000]
        bf = _bf_from(truth, 1 << 17)
        d = list(truth)
        for p in sorted(rng.choice(np.arange(K, 3900 - K), 25, replace=False))[::-1]:
            kind = int(rng.integers(3))
            if kind == 0:
                d[p] = ""
            elif kind == 1:
                del d[p : p + int(rng.integers(1, 4))]
            else:
                d[p] = "ACGT"[int(rng.integers(4))]
        draft = "".join(d).encode()
        for mode in (0, 1):
            cfg = ne.Config(k=K, h=H, use_ratio=True, mode=mode, mask=1)
            out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg)
            out_n, recs_n, _ = native.polish_contig(draft, bf, cfg, _tables(cfg))
            assert out_n == out_o, (trial, mode)
            assert recs_n == recs_o, (trial, mode)


def test_unsupported_config_falls_back_to_python_engine():
    """Configs outside gp_polish_contig's limits (k>64, max_del>7) must
    still polish through the two-phase engine, not crash."""
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    rng = np.random.default_rng(2)
    k = 96
    truth = "".join(rng.choice(list("ACGT")) for _ in range(3000))
    bf = bloom.BloomFilter(1 << 17, H, k)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(nt.encode(truth), k), k, H))
    d = list(truth)
    d[1500] = "A" if d[1500] != "A" else "C"
    draft = "".join(d).encode()
    cfg = ne.Config(k=k, h=H, use_ratio=True, mode=1, mask=1)
    out_o, recs_o, _ = ne.polish_contig(draft, bf, cfg)
    out_e, recs_e, _ = NtEditTPU(cfg, bf).polish_contig(draft)
    assert out_e == out_o
    assert recs_e == recs_o


@pytest.mark.parametrize("mode", [0, 1])
@pytest.mark.parametrize("use_ratio", [True, False])
def test_walker_snv_matches_oracle(mode, use_ratio):
    """SNV mode (-s, reference ntedit.cpp:1540-1556) in the native walk is
    byte-identical to the oracle: every window trialed, the draft base
    competing as the support baseline."""
    rng = np.random.default_rng(17)
    truth, draft = _mutated(rng, n=3000, n_err=10, kinds="sid")
    bf = _bf_from(truth)
    cfg = ne.Config(k=K, h=H, use_ratio=use_ratio, mode=mode, mask=1, snv=1)
    want_out, want_recs, want_ed = ne.polish_contig(draft, bf, cfg)
    tables = siteeval.make_tables(
        cfg.k, cfg.jump, cfg.max_insertions, cfg.max_deletions, snv=True
    )
    got_out, got_recs, got_st = native.polish_contig(draft, bf, cfg, tables)
    assert got_out == want_out
    assert got_recs == want_recs
    assert (got_st.n_subs, got_st.n_ins, got_st.n_dels, got_st.n_masked) == (
        want_ed.n_subs, want_ed.n_ins, want_ed.n_dels, want_ed.n_masked
    )


def test_engine_snv_routes_and_matches():
    """NtEditTPU accepts snv configs: native walk when available, oracle
    fallback otherwise — identical outputs."""
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    rng = np.random.default_rng(23)
    truth, draft = _mutated(rng, n=2000, n_err=6, kinds="s")
    bf = _bf_from(truth)
    cfg = ne.Config(k=K, h=H, use_ratio=True, mode=1, mask=1, snv=1)
    want_out, want_recs, _ = ne.polish_contig(draft, bf, cfg)
    eng = NtEditTPU(cfg, bf, backend="numpy")
    got_out, got_recs, _ = eng.polish_contig(draft)
    assert (got_out, got_recs) == (want_out, want_recs)
    import os

    os.environ["GPTPU_NO_NATIVE_WALK"] = "1"
    try:
        eng2 = NtEditTPU(cfg, bf, backend="numpy")
        got2, recs2, _ = eng2.polish_contig(draft)
    finally:
        os.environ.pop("GPTPU_NO_NATIVE_WALK", None)
    assert (got2, recs2) == (want_out, want_recs)
