"""Fused device phase-A (ops/scan_eval) parity vs the host spec.

The fused program's presence bits, detection heads, and candidate-support
tables must agree with the engine's host masks (polish/ntedit_tpu._masks)
and the site-eval spec (ops/siteeval.eval_sites_np) — these are what the
walker's table replay consumes, so any divergence is a byte-exactness bug.
"""

import pytest

import numpy as np

from goldpolish_tpu.ops import bloom, nthash as nt, siteeval
from goldpolish_tpu.ops.scan_eval import EvalConfig, FusedEval, T_SURVIVORS
from goldpolish_tpu.polish.multik import ntedit_config_for_k
from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

K, H = 32, 4


def _scenario(n=60_000, seed=3, err_spacing=997):
    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 17, H, K)
    codes = np.frombuffer(truth, np.uint8)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, K), K, H))
    d = bytearray(truth)
    kinds = []
    for i, p in enumerate(range(3 * K, n - 3 * K, err_spacing)):
        kind = i % 3
        if kind == 0:
            d[p] = ord("A") if d[p] != ord("A") else ord("G")
        elif kind == 1:
            q = p
            while d[q] == d[q - 1] or d[q] == d[q + 1]:
                q += 1
            del d[q]
        else:
            ins = next(c for c in b"TGCA" if c != d[p - 1] and c != d[p])
            d.insert(p, ins)
        kinds.append(kind)
    return truth, bytes(d), bf


def _heads_ref(hot: np.ndarray, k: int) -> np.ndarray:
    """First hot window with no hot in [w-k+1, w-1] (the device rule)."""
    heads = []
    for w in np.nonzero(hot)[0]:
        if not hot[max(0, w - k + 1):w].any():
            heads.append(w)
    return np.array(heads, np.int64)


@pytest.mark.slow
def test_fused_matches_host_spec():
    truth, draft, bf = _scenario()
    cfg = ntedit_config_for_k(K)
    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    ecfg = EvalConfig(
        k=K, h=H, jump=cfg.jump, max_ins=cfg.max_insertions,
        max_del=cfg.max_deletions, thr_edit=cfg.thr_edit,
        thr_missing=cfg.thr_missing, s_max=256,
    )
    fused = FusedEval(ecfg, int(bf.bits), tables)

    import jax.numpy as jnp

    codes = np.frombuffer(draft, np.uint8)
    L = 1 << 16
    rows = np.frombuffer(
        draft + b"A" * ((-len(draft)) % L), np.uint8
    ).reshape(-1, L)
    # overlap rows with a k-1 halo the way scanpipe segments do
    seg_rows = []
    seg_meta = []  # (row, off, w0, nw)
    nw_row = L - K + 1
    w = 0
    total_nw = len(codes) - K + 1
    while w < total_nw:
        take = min(nw_row, total_nw - w)
        row = np.full(L, ord("A"), np.uint8)
        row[: take + K - 1] = codes[w : w + take + K - 1]
        seg_rows.append(row)
        seg_meta.append((len(seg_rows) - 1, 0, w, take))
        w += take
    buf = np.stack(seg_rows)
    words = jnp.asarray(bf.words_u32())
    (packed, n_sites, site, gate, sub_sup, del_sup, ins_lane, ins_ok,
     ins_sup) = (np.asarray(x) for x in fused(words, jnp.asarray(buf)))

    # --- presence bits match the host scan per segment
    eng = NtEditTPU(cfg, bf, backend="numpy")
    pres_host = eng._present_host(codes)
    bits = np.unpackbits(packed, axis=1, bitorder="little")
    for r, off, w0, nw in seg_meta:
        got = bits[r, off : off + nw].astype(bool)
        np.testing.assert_array_equal(got, pres_host[w0 : w0 + nw], str(w0))

    # --- heads match the reference rule on the engine's hot mask
    masks = eng._masks(codes, pres_host)
    # per-row heads (rows are independent in the device program)
    exp_heads_global = []
    for r, off, w0, nw in seg_meta:
        # the device sees the padded row bytes, pad windows included (the
        # host drops any pad-region heads via the segment map)
        row_codes = buf[r]
        row_pres = eng._present_host(row_codes)
        row_masks = eng._masks(row_codes, row_pres)
        for wlocal in _heads_ref(row_masks.hot, K):
            exp_heads_global.append(r * nw_row + off + wlocal)
    exp_heads_global = np.array(sorted(exp_heads_global))
    got_sites = site[site >= 0]
    assert int(n_sites) == len(exp_heads_global)
    np.testing.assert_array_equal(got_sites, exp_heads_global[: len(got_sites)])

    # --- per-site tables match eval_sites_np on interior sites
    thr = np.float32(cfg.thr_edit)
    checked = 0
    for gi, g_site in enumerate(got_sites):
        r = g_site // nw_row
        wlocal = g_site % nw_row
        seg = next(m for m in seg_meta if m[0] == r)
        _r, off, w0, nw = seg
        if wlocal > nw - 2 * K:  # host drop rule: segment-tail sites
            continue
        w_contig = w0 + (wlocal - off)
        sup = siteeval.eval_sites_np(
            codes, np.array([w_contig]), bf, tables, H, tables.n_combos
        )
        np.testing.assert_array_equal(gate[gi], sup.gate[0].astype(np.uint8))
        np.testing.assert_array_equal(sub_sup[gi], sup.sub_support[0])
        np.testing.assert_array_equal(del_sup[gi], sup.del_support[0])
        # expected needing lane
        accepted = sup.gate[0] & (sup.sub_support[0].astype(np.float32) >= thr)
        need = None
        for ci in range(4):
            if accepted[: ci].any():
                break
            if (sup.gate[0][ci] and not accepted[ci]
                    and sup.sub_cand[0][ci] != 0):
                need = ci
                break
        if need is None:
            assert ins_lane[gi] == -1
        else:
            assert ins_lane[gi] == need
            host_ins = sup.ins_support[0][need]
            dev_ins = ins_sup[gi]
            if ins_ok[gi]:
                passing = host_ins.astype(np.float32) >= thr
                assert (host_ins[passing] == dev_ins[passing]).all()
                # non-passing combos: either the exact count (a survivor)
                # or 0 (pre-screened out) — never a passing-looking value
                other = dev_ins[~passing]
                assert (
                    (other == host_ins[~passing]) | (other == 0)
                ).all()
                assert (other.astype(np.float32) < thr).all()
        checked += 1
    assert checked >= 20  # the scenario must actually exercise the tables


@pytest.mark.slow
def test_fused_survivor_overflow_flags():
    """A site whose h1 prescreen passes > T_SURVIVORS combos must flag
    ins_ok=0 (host falls back) rather than return a truncated table."""
    truth, draft, bf = _scenario(n=20_000, err_spacing=1999)
    cfg = ntedit_config_for_k(K)
    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    # thr_edit ~0: every combo with >= 1 maybe-window survives the h1
    # prescreen, overflowing T_SURVIVORS at any realistically-loaded filter
    ecfg = EvalConfig(
        k=K, h=H, jump=cfg.jump, max_ins=cfg.max_insertions,
        max_del=cfg.max_deletions, thr_edit=0.5,
        thr_missing=cfg.thr_missing, s_max=64,
    )
    import jax.numpy as jnp

    fused = FusedEval(ecfg, int(bf.bits), tables)
    codes = np.frombuffer(draft, np.uint8)
    L = 1 << 14
    buf = np.full((len(codes) // L + 1, L), ord("A"), np.uint8)
    # one segment per row, no halos needed for this check
    for r in range(buf.shape[0]):
        chunk = codes[r * L : (r + 1) * L]
        buf[r, : len(chunk)] = chunk
    words = jnp.asarray(bf.words_u32())
    out = [np.asarray(x) for x in fused(words, jnp.asarray(buf))]
    site, ins_lane, ins_ok = out[2], out[6], out[7]
    lanes = ins_lane[(site >= 0)]
    oks = ins_ok[(site >= 0)]
    flagged = oks[lanes >= 0]
    assert len(flagged) and (flagged == 0).any(), (
        "expected at least one survivor overflow at thr_edit=0.5"
    )
    assert T_SURVIVORS < tables.n_combos


@pytest.mark.slow
def test_hybrid_engine_with_device_eval_end_to_end(monkeypatch):
    """Production pipelined path with the fused eval forced on (the CPU
    mesh would normally disable it): byte-identical to the host backend,
    with real table hits reported."""
    monkeypatch.setenv("GPTPU_DEVICE_EVAL", "1")
    monkeypatch.setenv("GPTPU_FORCE_DEVICE_SCAN", "1")
    rng = np.random.default_rng(7)
    n = 150_000
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 18, H, K)
    bf.insert(nt.multi_hashes(
        nt.canonical_hashes(np.frombuffer(truth, np.uint8), K), K, H
    ))
    drafts = []
    for c in range(3):
        d = bytearray(truth[c * 50_000 : (c + 1) * 50_000])
        for i, p in enumerate(range(2 * K + c, len(d) - 2 * K, 431)):
            kind = i % 3
            if kind == 0:
                d[p] = ord("A") if d[p] != ord("A") else ord("G")
            elif kind == 1:
                q = p
                while d[q] == d[q - 1] or d[q] == d[q + 1]:
                    q += 1
                del d[q]
            else:
                ins = next(x for x in b"TGCA" if x != d[p - 1] and x != d[p])
                d.insert(p, ins)
        drafts.append(bytes(d))
    cfg = ntedit_config_for_k(K)
    ref_eng = NtEditTPU(cfg, bf, backend="numpy")
    want = [o for o, _r, _e in ref_eng.polish_many(drafts)]

    eng = NtEditTPU(cfg, bf, backend="hybrid")
    eng._ensure_scanner()  # lazy off the device path; force for the assert
    assert eng._scanner.eval_enabled
    # serial pipelined path
    got = eng.polish_many(drafts)
    assert [o for o, _r, _e in got] == want
    # pooled pipelined path, with table-hit accounting
    got_pool = eng.polish_many(drafts, processes=2, shard_bases=30_000)
    assert [o for o, _r, _e in got_pool] == want
    hits = sum(e.n_table_hits for _o, _r, e in got_pool)
    assert hits > 50, hits
