"""Native walk with fused phase-A tables == native walk without them.

The table replay (gp_native.cpp run_trials_table_c) must reproduce the
probing walk byte-for-byte — output, records, and edit counters — with
table hits actually happening (otherwise the test proves nothing).
"""

import pytest

import numpy as np

from goldpolish_tpu import native
from goldpolish_tpu.ops import bloom, nthash as nt, siteeval
from goldpolish_tpu.ops.scan_eval import EvalConfig, FusedEval
from goldpolish_tpu.polish import ntedit_oracle as orc
from goldpolish_tpu.polish.multik import ntedit_config_for_k

K, H = 32, 4


def _scenario(n=120_000, seed=11, err_spacing=613):
    rng = np.random.default_rng(seed)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].tobytes()
    bf = bloom.BloomFilter(1 << 18, H, K)
    codes = np.frombuffer(truth, np.uint8)
    bf.insert(nt.multi_hashes(nt.canonical_hashes(codes, K), K, H))
    d = bytearray(truth)
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
    return truth, bytes(d), bf


def _fused_tables(draft: bytes, bf, cfg, s_max=512):
    """Run the fused program over the whole contig as one row and map the
    outputs into walker site_tables (the drop rule included)."""
    import jax.numpy as jnp

    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    ecfg = EvalConfig(
        k=K, h=H, jump=cfg.jump, max_ins=cfg.max_insertions,
        max_del=cfg.max_deletions, thr_edit=cfg.thr_edit,
        thr_missing=cfg.thr_missing, s_max=s_max,
    )
    fused = FusedEval(ecfg, int(bf.bits), tables)
    codes = np.frombuffer(draft, np.uint8)
    words = jnp.asarray(bf.words_u32())
    (packed, n_sites, site, gate, sub_sup, del_sup, ins_lane, ins_ok,
     ins_sup) = (np.asarray(x) for x in fused(words, jnp.asarray(codes[None])))
    nw = len(codes) - K + 1
    present = np.unpackbits(packed[0], bitorder="little")[:nw].astype(bool)
    keep = (site >= 0) & (site <= nw - 2 * K)  # interior drop rule
    idx = np.nonzero(keep)[0]
    site_tables = (
        site[idx].astype(np.int64), gate[idx], sub_sup[idx].astype(np.int8),
        del_sup[idx].astype(np.int8), ins_lane[idx], ins_ok[idx],
        ins_sup[idx],
    )
    assert int(n_sites) > 0 and len(idx) > 0
    return present, site_tables


@pytest.mark.slow
def test_table_replay_byte_identical():
    truth, draft, bf = _scenario()
    cfg = ntedit_config_for_k(K)
    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    present, site_tables = _fused_tables(draft, bf, cfg)

    out_ref, recs_ref, st_ref = native.polish_contig(
        draft, bf, cfg, tables, present=present
    )
    out_tab, recs_tab, st_tab = native.polish_contig(
        draft, bf, cfg, tables, present=present, site_tables=site_tables
    )
    assert out_tab == out_ref
    assert recs_tab == recs_ref
    assert (st_tab.n_subs, st_tab.n_ins, st_tab.n_dels, st_tab.n_masked) == (
        st_ref.n_subs, st_ref.n_ins, st_ref.n_dels, st_ref.n_masked
    )
    # tables must actually be hit for this test to mean anything
    assert st_tab.n_table_hits > 50, st_tab.n_table_hits
    assert st_ref.n_table_hits == 0
    # and the oracle agrees end to end
    out_orc, _, _ = orc.polish_contig(draft, bf, cfg)
    assert out_tab == out_orc


@pytest.mark.slow
def test_table_replay_mode0():
    truth, draft, bf = _scenario(n=60_000, seed=23)
    cfg = ntedit_config_for_k(K)
    cfg.mode = 0
    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    present, site_tables = _fused_tables(draft, bf, cfg)
    out_ref, recs_ref, _ = native.polish_contig(
        draft, bf, cfg, tables, present=present
    )
    out_tab, recs_tab, st_tab = native.polish_contig(
        draft, bf, cfg, tables, present=present, site_tables=site_tables
    )
    assert out_tab == out_ref
    assert recs_tab == recs_ref
    assert st_tab.n_table_hits > 20


@pytest.mark.slow
def test_table_replay_giveup_falls_back():
    """Tables built with a tiny thr_edit overflow the survivor cap; the
    walker must fall back natively and still be byte-identical."""
    truth, draft, bf = _scenario(n=40_000, seed=5)
    cfg = ntedit_config_for_k(K)
    tables = siteeval.make_tables(K, cfg.jump, cfg.max_insertions,
                                  cfg.max_deletions)
    import jax.numpy as jnp

    ecfg = EvalConfig(
        k=K, h=H, jump=cfg.jump, max_ins=cfg.max_insertions,
        max_del=cfg.max_deletions, thr_edit=0.5,  # overflows the prescreen
        thr_missing=cfg.thr_missing, s_max=256,
    )
    fused = FusedEval(ecfg, int(bf.bits), tables)
    codes = np.frombuffer(draft, np.uint8)
    words = jnp.asarray(bf.words_u32())
    outs = [np.asarray(x)
            for x in fused(words, jnp.asarray(codes[None]))]
    packed, _n, site, gate, sub_sup, del_sup, ins_lane, ins_ok, ins_sup = outs
    nw = len(codes) - K + 1
    present = np.unpackbits(packed[0], bitorder="little")[:nw].astype(bool)
    keep = (site >= 0) & (site <= nw - 2 * K)
    idx = np.nonzero(keep)[0]
    # NOTE: gate/sub/del are threshold-independent and stay exact; ins_ok=0
    # marks the overflowed sites
    site_tables = (
        site[idx].astype(np.int64), gate[idx], sub_sup[idx].astype(np.int8),
        del_sup[idx].astype(np.int8), ins_lane[idx], ins_ok[idx],
        ins_sup[idx],
    )
    assert (ins_ok[idx] == 0).any()
    out_ref, recs_ref, _ = native.polish_contig(
        draft, bf, cfg, tables, present=present
    )
    out_tab, recs_tab, st_tab = native.polish_contig(
        draft, bf, cfg, tables, present=present, site_tables=site_tables
    )
    assert out_tab == out_ref
    assert recs_tab == recs_ref
    assert st_tab.n_table_giveups > 0
