"""JAX/device backend for batched site evaluation.

Shares the patch-construction code with ops.siteeval (host NumPy — the
buffers are small and irregular to build, cheap to ship) and runs the heavy
part — closed-form ntHash of every checked window of every candidate patch
plus the Bloom probes — as one jitted device program per (S, C) bucket.

Produces SiteSupports bit-identical to eval_sites_np (differentially
tested), so the ntEdit engine can switch backends freely.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash_jax as ntj
from . import siteeval
from .siteeval import SiteSupports, SiteTables


def _window_hashes(patches, k: int, h: int, j_idx):
    f = ntj.forward_hashes(patches, k)
    r = ntj.reverse_hashes(patches, k)
    base = (f + r)[..., j_idx]
    return ntj.multi_hashes(base, k, h)


def _probe(words, bits: int, hashes):
    if bits & (bits - 1) == 0:
        idx = (hashes & jnp.uint64(bits - 1)).astype(jnp.uint32)
    else:
        idx = (hashes % jnp.uint64(bits)).astype(jnp.uint32)
    word = words[(idx >> jnp.uint32(5)).astype(jnp.int32)]
    return ((word >> (idx & jnp.uint32(31))) & jnp.uint32(1) != 0).all(axis=-1)


@lru_cache(maxsize=32)
def _kernel(k: int, h: int, jump: int, bits: int,
            j_sub: tuple, j_ins: tuple, j_del: tuple):
    j_sub = jnp.asarray(np.array(j_sub, np.int32))
    j_ins = jnp.asarray(np.array(j_ins, np.int32))
    j_del = jnp.asarray(np.array(j_del, np.int32))

    @jax.jit
    def run(sub_patches, ins_patches, del_patches, words):
        sub_pr = _probe(words, bits, _window_hashes(
            sub_patches, k, h, jnp.concatenate([jnp.zeros(1, jnp.int32), j_sub])
        ))
        gate = sub_pr[..., 0]
        sub_sup = sub_pr[..., 1:].sum(axis=-1, dtype=jnp.int32)
        ins_pr = _probe(words, bits, _window_hashes(ins_patches, k, h, j_ins))
        ins_sup = ins_pr.sum(axis=-1, dtype=jnp.int32)
        del_pr = _probe(words, bits, _window_hashes(del_patches, k, h, j_del))
        return gate, sub_sup, ins_sup, del_pr

    return run


def eval_sites_jax(seq_codes: np.ndarray, sites_w: np.ndarray, words, bits: int,
                   tables: SiteTables, h: int, n_combos: int | None = None,
                   s_bucket: int = 128) -> SiteSupports:
    """Device evaluator; same results as siteeval.eval_sites_np."""
    k = tables.k
    C = tables.n_combos if n_combos is None else n_combos
    n = len(seq_codes)
    S = len(sites_w)
    prefix, draft, suffix, _ = siteeval.gather_site_context(seq_codes, sites_w, tables)
    sub_patches, cand = siteeval.build_sub_patches(prefix, draft, suffix, tables)
    ins_patches = siteeval.build_ins_patches(prefix, draft, suffix, tables, C)
    del_patches = siteeval.build_del_patches(prefix, suffix, tables)

    # pad the site axis to a bucket to bound recompiles
    SB = s_bucket
    while SB < S:
        SB *= 2
    def pad(a):
        if a.shape[0] == SB:
            return a
        return np.concatenate(
            [a, np.zeros((SB - a.shape[0],) + a.shape[1:], a.dtype)], axis=0
        )

    run = _kernel(
        k, h, tables.jump, bits,
        tuple(tables.j_sub.tolist()), tuple(tables.j_ins.tolist()),
        tuple(tables.j_del.tolist()),
    )
    gate, sub_sup, ins_sup, del_pr = run(
        jnp.asarray(pad(sub_patches)), jnp.asarray(pad(ins_patches)),
        jnp.asarray(pad(del_patches)), words,
    )
    gate = np.asarray(gate)[:S]
    sub_sup = np.asarray(sub_sup)[:S]
    ins_sup = np.asarray(ins_sup)[:S]
    del_pr = np.asarray(del_pr)[:S]

    # deletion validity masks (end-of-contig roll bounds) on host
    p = sites_w + k - 1
    d = np.arange(1, tables.max_del + 1)[None, :, None]
    jj = tables.j_del[None, None, :]
    valid = np.where(
        jj == 0, (p[:, None, None] + d) <= n - 1,
        (p[:, None, None] + d + jj + 1) <= n - 1,
    )
    del_sup = (del_pr & valid).sum(axis=-1).astype(np.int32)

    return SiteSupports(
        sub_cand=cand, gate=gate, sub_support=sub_sup,
        ins_support=ins_sup, del_support=del_sup, n_combos=C,
    )
