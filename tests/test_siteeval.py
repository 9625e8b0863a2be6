"""Cross-validate batched site evaluation against the oracle's scalar trials.

The supports computed by ops.siteeval (patched-buffer closed-form hashing)
must equal supports computed by walking the oracle editor's roll/changelast
primitives — the same recurrences the reference uses
(reference: subprojects/ntedit/ntedit.cpp:1558-1713, 1276-1326, 1157-1234).
"""

import numpy as np
import pytest

from goldpolish_tpu.ops import bloom, nthash as nt, siteeval
from goldpolish_tpu.polish import ntedit_oracle as ne


K, H, JUMP = 32, 4, 3


def _mk(seq_len=600, seed=0, with_errors=True):
    rng = np.random.default_rng(seed)
    truth = "".join(rng.choice(list("ACGT")) for _ in range(seq_len))
    bf = bloom.BloomFilter(1 << 16, H, K)
    base = nt.canonical_hashes(nt.encode(truth), K)
    bf.insert(nt.multi_hashes(base, K, H))
    draft = bytearray(truth.encode())
    if with_errors:
        for p in (150, 300, 450):
            draft[p] = ord("A") if draft[p] != ord("A") else ord("G")
    return truth, bytes(draft), bf


def _scalar_sub_support(seq, w, sub_base, bf, cfg):
    """Reference sub-check loop via oracle primitives (ntedit.cpp:1558-1626)."""
    ed = ne._Editor(cfg, bf)
    n = len(seq)
    seqb = bytearray(seq)
    new_seq = [ne.Node(0, 0, n - 1, 0, 0)]
    fh, rh, _ = nt.ntc64_base(np.frombuffer(seq[w : w + K], np.uint8), K)
    draft = ne._upper(seq[w + K - 1])
    tfh = nt.ntf64_changelast(fh, draft, sub_base)
    trh = nt.ntr64_changelast(rh, K, draft, sub_base)
    gate = bf.contains_one(nt.multi_hashes(np.uint64((tfh + trh) & nt.MASK64), K, H))
    st = {"h": w, "t": w + K - 1, "hn": 0, "tn": 0}
    seqb[st["t"]] = sub_base
    check = 0
    kk = 0
    while kk < K and st["h"] < n and st["t"] < n:
        ok, c_out, c_in = ed.roll(st, seqb, new_seq)
        if not ok:
            break
        tfh, trh, hv = nt.ntc64_roll(tfh, trh, K, c_out, c_in)
        if kk % JUMP == 0 and bf.contains_one(nt.multi_hashes(np.uint64(hv), K, H)):
            check += 1
        kk += 1
    return gate, check


def test_sub_supports_match_scalar():
    truth, draft, bf = _mk()
    cfg = ne.Config(k=K, h=H, use_ratio=True)
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(draft.decode())
    # pick sites: the windows ending at each error position
    sites = np.array([150 - K + 1, 300 - K + 1, 450 - K + 1, 10], np.int64)
    sup = siteeval.eval_sites_np(codes, sites, bf, tables, H)
    for si, w in enumerate(sites):
        draft_char = ne._upper(draft[w + K - 1])
        for ci in range(int(tables.sub_cand_n[draft_char])):
            sub = int(tables.sub_cand[draft_char, ci])
            gate, check = _scalar_sub_support(draft, int(w), sub, bf, cfg)
            assert sup.gate[si, ci] == gate, (si, ci)
            assert sup.sub_support[si, ci] == check, (si, ci, check)


def test_del_supports_match_oracle_method():
    truth, _, bf = _mk(with_errors=False)
    # draft with an extra inserted base -> deletions should verify
    pos = 288
    draft = (truth[:pos] + "T" + truth[pos:]).encode()
    cfg = ne.Config(k=K, h=H, use_ratio=True)
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(draft.decode())
    sites = np.array([pos - K + 1, pos - K + 5, 40], np.int64)
    sup = siteeval.eval_sites_np(codes, sites, bf, tables, H)
    ed = ne._Editor(cfg, bf)
    n = len(draft)
    for si, w in enumerate(sites):
        w = int(w)
        new_seq = [ne.Node(0, 0, n - 1, 0, 0)]
        st = {"h": w, "t": w + K - 1, "hn": 0, "tn": 0}
        fh, rh, _ = nt.ntc64_base(np.frombuffer(draft[w : w + K], np.uint8), K)
        draft_char = ne._upper(draft[w + K - 1])
        for d in range(1, tables.max_del + 1):
            support, _ = ed.try_deletion(
                draft_char, d, st, fh, rh, bytearray(draft), new_seq
            )
            got = int(sup.del_support[si, d - 1])
            want = support if support > 0 else got  # oracle returns 0 below accept
            # compare raw counts only where accept rule passed; otherwise
            # verify the engine count also fails the accept rule
            if support > 0:
                assert got == support, (si, d)
            else:
                assert not _del_accept(got), (si, d, got)


def _del_accept(c):
    return np.float32(c) >= (1 + np.float32(K) / np.float32(JUMP)) * np.float32(0.5)


def _scalar_ins_support(seq, w, index_char, combo, bf):
    """Reference insertion check (ntedit.cpp:1276-1326) via scalar hashes."""
    n = len(seq)
    k = K
    fh, rh, _ = nt.ntc64_base(np.frombuffer(seq[w : w + k], np.uint8), k)
    draft = ne._upper(seq[w + k - 1])
    ins_bases = combo.encode() + bytes([draft])
    tfh = nt.ntf64_changelast(fh, draft, index_char)
    trh = nt.ntr64_changelast(rh, k, draft, index_char)
    check = 0
    kk = 0
    h_pos = w
    t_pos = w + k - 1
    while kk < len(ins_bases) - 1 and h_pos < n:
        c_out = seq[h_pos]
        tfh, trh, hv = nt.ntc64_roll(tfh, trh, k, c_out, ins_bases[kk + 1])
        h_pos += 1
        if kk % JUMP == 0 and bf.contains_one(nt.multi_hashes(np.uint64(hv), k, H)):
            check += 1
        kk += 1
    while kk < k - 1 and h_pos < n:
        c_out = seq[h_pos]
        h_pos += 1
        if t_pos + 1 < n:
            t_pos += 1
            c_in = seq[t_pos]
            tfh, trh, hv = nt.ntc64_roll(tfh, trh, k, c_out, c_in)
            if kk % JUMP == 0 and bf.contains_one(nt.multi_hashes(np.uint64(hv), k, H)):
                check += 1
        kk += 1
    return check


def test_ins_supports_match_scalar():
    truth, _, bf = _mk(with_errors=False)
    # draft missing two bases at pos -> insertions should verify
    pos = 333
    missing = truth[pos : pos + 2]
    draft = (truth[:pos] + truth[pos + 2 :]).encode()
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(draft.decode())
    sites = np.array([pos - K + 1, 60], np.int64)
    C = 21  # tier: combos of length <= 3
    sup = siteeval.eval_sites_np(codes, sites, bf, tables, H, n_combos=C)
    for si, w in enumerate(sites):
        w = int(w)
        draft_char = ne._upper(draft[w + K - 1])
        for ci in range(int(tables.sub_cand_n[draft_char])):
            index_char = int(tables.sub_cand[draft_char, ci])
            for c in range(C):
                combo = ne.MULTI_POSSIBLE_BASES[chr(index_char)][c]
                want = _scalar_ins_support(draft, w, index_char, combo, bf)
                got = int(sup.ins_support[si, ci, c])
                assert got == want, (si, ci, c, combo, got, want)


def test_sites_near_contig_end_del_masks():
    """Deletion probes past the contig end must not count."""
    truth, _, bf = _mk(seq_len=200, with_errors=False)
    draft = truth.encode()
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(truth)
    n = len(truth)
    w = n - 2 * K  # eligibility boundary: p + k == n - 1... last eligible-ish
    sup = siteeval.eval_sites_np(codes, np.array([w], np.int64), bf, tables, H)
    p = w + K - 1
    for d in range(1, 6):
        max_valid = sum(
            1 for j in tables.j_del
            if (j == 0 and p + d <= n - 1) or (j > 0 and p + d + j + 1 <= n - 1)
        )
        assert sup.del_support[0, d - 1] <= max_valid


@pytest.mark.slow
def test_jax_eval_matches_numpy_v2():
    """Device-side patch construction (siteeval_jax v2) parity on CPU."""
    import jax.numpy as jnp

    from goldpolish_tpu.ops import siteeval_jax

    truth, draft, bf = _mk(seq_len=900, seed=7)
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(draft.decode())
    sites = np.array([100, 150 - K + 1, 300 - K + 1, 450 - K + 1, 700], np.int64)
    for C in (21, tables.n_combos):
        want = siteeval.eval_sites_np(codes, sites, bf, tables, H, n_combos=C)
        got = siteeval_jax.eval_sites_jax(
            codes, sites, jnp.asarray(bf.words_u32()), int(bf.bits),
            tables, H, C,
        )
        assert np.array_equal(got.gate, want.gate)
        assert np.array_equal(got.sub_support, want.sub_support)
        assert np.array_equal(got.ins_support, want.ins_support)
        assert np.array_equal(got.del_support, want.del_support)


def test_jax_eval_reuses_codes_dev():
    import jax.numpy as jnp

    from goldpolish_tpu.ops import siteeval_jax

    truth, draft, bf = _mk(seq_len=600, seed=8)
    tables = siteeval.make_tables(K, JUMP)
    codes = nt.encode(draft.decode())
    padded = np.zeros(1024, np.uint8)
    padded[: len(codes)] = codes
    sites = np.array([50, 200], np.int64)
    want = siteeval.eval_sites_np(codes, sites, bf, tables, H, n_combos=21)
    got = siteeval_jax.eval_sites_jax(
        codes, sites, jnp.asarray(bf.words_u32()), int(bf.bits), tables, H,
        21, codes_dev=jnp.asarray(padded),
    )
    assert np.array_equal(got.sub_support, want.sub_support)
    assert np.array_equal(got.ins_support, want.ins_support)
