"""Pallas TPU kernel: Bloom filter probe with the filter resident in VMEM.

The plain per-batch Bloom filter is 512 KiB (reference:
src/goldpolish_targeted_bfs.cpp:271) — it fits comfortably in VMEM
(~16 MB/core), so the probe becomes on-chip random access instead of XLA's
HBM gathers.  The kernel receives the *low 32 bits* of every derived hash
(the bit count is a power of two <= 2^32, so the modulo only touches the
low word), gathers the containing u32 words from the VMEM-resident filter,
tests the bits and AND-reduces across the hash_num axis.

STATUS: the take-along-axis kernel (`_probe_kernel`) remains interpret-only
(Mosaic's dynamic gather cannot span vregs); the PRODUCTION on-TPU kernel is
the int8 MXU one-hot lookup below (`probe_lo32_mxu_i8`), measured ~2x the
XLA gather probe at <= 1 MiB filters on a v5e and bit-exact at every size
via its row-chunked variant.  ops/scan_conv.DeviceScanner picks MXU vs XLA
gather by filter size.

Fallback: `probe_lo32_reference` is the jnp equivalent used for interpret-
mode tests and as the non-TPU path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 1024  # hash tuples per grid step


def _probe_kernel(words_ref, lo_ref, out_ref, *, mask: int, hash_num: int):
    """Strictly-2D formulation for Mosaic: per hash column, gather the
    containing u32 word with two shape-preserving take_along_axis ops
    (axis-0 row select, then axis-1 lane select) and AND-reduce."""
    lo = lo_ref[...]  # [BLOCK_ROWS, hash_num] uint32
    words = words_ref[...]
    w2 = words.reshape(-1, 128)  # [R, 128]
    rows_n = w2.shape[0]
    block = lo.shape[0]
    if block > rows_n:
        reps = -(-block // rows_n)
        op = jnp.concatenate([w2] * reps, axis=0)[:block]
    else:
        op = w2[:block] if block == rows_n else jnp.concatenate(
            [w2, jnp.zeros((0, 128), w2.dtype)], axis=0
        )
    acc = None
    for hi in range(hash_num):
        idx_col = lo[:, hi : hi + 1] & jnp.uint32(mask)  # [BLOCK, 1]
        word_idx = (idx_col >> jnp.uint32(5)).astype(jnp.int32)
        row = jnp.broadcast_to(word_idx >> 7, (block, 128))
        col = jnp.broadcast_to(word_idx & 127, (block, 128))
        rows = jnp.take_along_axis(op, row, axis=0)
        lanes = jnp.take_along_axis(rows, col, axis=1)
        val = lanes[:, 0:1]  # [BLOCK, 1]
        bitpos = idx_col & jnp.uint32(31)
        ok = ((val >> bitpos) & jnp.uint32(1)) != 0  # [BLOCK, 1]
        acc = ok if acc is None else (acc & ok)
    out_ref[...] = acc


def probe_lo32_pallas(words: jnp.ndarray, bits: int, lo32: jnp.ndarray) -> jnp.ndarray:
    """Probe [N, hash_num] low-32-bit hash values against the BF words.

    bits must be a power of two (default sizing guarantees it).
    Returns bool[N].  Runs under a local x64-disable so jnp index helpers
    inside the kernel stay 32-bit (Mosaic rejects 64-bit types).
    """
    with jax.enable_x64(False):
        return _probe_lo32_pallas_32(words, bits, lo32)


@functools.partial(jax.jit, static_argnums=(1,))
def _probe_lo32_pallas_32(words: jnp.ndarray, bits: int, lo32: jnp.ndarray) -> jnp.ndarray:
    assert bits & (bits - 1) == 0, "pallas probe requires power-of-two bits"
    n, h = lo32.shape
    n_pad = -(-n // BLOCK_ROWS) * BLOCK_ROWS
    if n_pad != n:
        lo32 = jnp.pad(lo32, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // BLOCK_ROWS,)
    out = pl.pallas_call(
        functools.partial(_probe_kernel, mask=bits - 1, hash_num=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((words.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
    )(words, lo32)
    return out[:n, 0]


def probe_lo32_reference(words: jnp.ndarray, bits: int, lo32: jnp.ndarray) -> jnp.ndarray:
    """jnp reference of the same computation (oracle for the kernel)."""
    idx = lo32 & jnp.uint32(bits - 1)
    word = words[(idx >> jnp.uint32(5)).astype(jnp.int32)]
    return ((word >> (idx & jnp.uint32(31))) & jnp.uint32(1) != 0).all(axis=-1)


def hashes_to_lo32(hashes) -> jnp.ndarray:
    """u64 hash tuples -> low 32 bits (sufficient for pow2 bit counts)."""
    return (hashes & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)


def probe_hashes_pallas(words, bits: int, hashes) -> jnp.ndarray:
    """Convenience: u64 [N, h] hashes -> bool[N] via the pallas kernel."""
    return probe_lo32_pallas(words, bits, hashes_to_lo32(hashes))


# --- MXU one-hot lookup kernel ----------------------------------------------
# Mosaic's dynamic gather cannot span vector registers, so the canonical TPU
# table lookup is a one-hot matmul on the MXU: select the containing 128-lane
# row of the word table with a one-hot [B, R] x [R, 128] contraction, then
# select the lane with a one-hot multiply-reduce.  u32 words ride as 4 bf16
# byte planes (bytes 0..255 are exact in bf16; f32 accumulation is exact).

MXU_BLOCK = 1024


def _probe_mxu_kernel(planes_ref, lo_ref, out_ref, *, mask: int, hash_num: int,
                      rows: int):
    lo = lo_ref[...]  # [B, h] uint32
    planes = planes_ref[...]  # [4, rows, 128] bfloat16 byte planes
    b = lo.shape[0]
    acc = None
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    for hi in range(hash_num):
        idx = lo[:, hi : hi + 1] & jnp.uint32(mask)  # [B,1]
        word_idx = (idx >> jnp.uint32(5)).astype(jnp.int32)
        row = word_idx >> 7  # [B,1]
        col = word_idx & 127
        one_hot = (row_iota == row).astype(jnp.bfloat16)  # [B, rows]
        val = jnp.zeros((b, 128), jnp.uint32)
        for byte in range(4):
            plane = planes[byte]
            sel = jnp.dot(one_hot, plane, preferred_element_type=jnp.float32)
            # f32 -> u32 must go through i32 (Mosaic cast support)
            sel_u = sel.astype(jnp.int32).astype(jnp.uint32)
            val = val | (sel_u << jnp.uint32(8 * byte))
        lane_oh = (lane_iota == col).astype(jnp.int32)
        # unsigned reductions are unsupported in Mosaic: reduce as int32
        # (word values fit, bit test only reads the selected word's bits)
        word_val = (
            (val.astype(jnp.int32) * lane_oh).sum(axis=1, keepdims=True)
        ).astype(jnp.uint32)  # [B,1]
        bitpos = idx & jnp.uint32(31)
        ok = ((word_val >> bitpos) & jnp.uint32(1)) != 0
        acc = ok if acc is None else (acc & ok)
    out_ref[...] = acc


def words_to_planes(words_u32: jnp.ndarray) -> jnp.ndarray:
    """u32 word table -> [4, rows, 128] bf16 byte planes (host-side prep)."""
    w2 = words_u32.reshape(-1, 128)
    planes = [
        ((w2 >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
        for b in range(4)
    ]
    return jnp.stack(planes, axis=0)


def probe_lo32_mxu(planes: jnp.ndarray, bits: int, lo32: jnp.ndarray) -> jnp.ndarray:
    """Probe via the MXU one-hot kernel; planes from words_to_planes."""
    with jax.enable_x64(False):
        return _probe_lo32_mxu_32(planes, bits, lo32)


@functools.partial(jax.jit, static_argnums=(1,))
def _probe_lo32_mxu_32(planes, bits: int, lo32):
    assert bits & (bits - 1) == 0
    n, h = lo32.shape
    rows = planes.shape[1]
    if rows > 2048:
        raise ValueError(
            "MXU one-hot lookup is sized for <=1 MiB filters "
            f"(got {rows} rows); use the XLA gather probe for larger tables"
        )
    n_pad = -(-n // MXU_BLOCK) * MXU_BLOCK
    if n_pad != n:
        lo32 = jnp.pad(lo32, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _probe_mxu_kernel, mask=bits - 1, hash_num=h, rows=rows
        ),
        grid=(n_pad // MXU_BLOCK,),
        in_specs=[
            pl.BlockSpec((4, rows, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MXU_BLOCK, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MXU_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
    )(planes, lo32)
    return out[:n, 0]


# --- int8 MXU one-hot lookup (production kernel) ------------------------------
# Same one-hot-matmul idea as above, but in int8 (2x the MXU rate of bf16 on
# v5e: 394 vs 197 TOPS) with offset encoding (byte - 128 fits int8; the
# one-hot row sums to exactly 1 within the hitting chunk, so adding 128 back
# under the hit mask is exact), and CHUNKED over plane rows so filters of any
# size compile: grid = (probe blocks, row chunks); each chunk OR-accumulates
# the selected word of the probes whose row falls inside it into a VMEM
# scratch, and the last chunk runs the bit test.  Measured on a v5e: ~2x the
# XLA gather probe at 512 KiB filters; the gather overtakes past ~1-2 MiB
# (cost here scales with filter size, the gather's does not) — callers pick
# by size (ops/scan_conv.DeviceScanner).

MXU_CHUNK_ROWS = 2048  # 1 MiB of filter per chunk (single-chunk fast path)


def _select_word(planes, lo_col, row_iota, lane_iota, *, mask, row0,
                 chunk_rows, masked: bool):
    """One-hot select the u32 word containing probe bit `lo_col & mask`.

    Returns (word_val [B,1] int32, bitpos [B,1] uint32).  With masked=True,
    probes whose row falls outside [row0, row0+chunk_rows) contribute 0.
    """
    idx = lo_col & jnp.uint32(mask)
    word_idx = (idx >> jnp.uint32(5)).astype(jnp.int32)
    row = (word_idx >> 7) - row0
    col = word_idx & 127
    one_hot = (row_iota == row).astype(jnp.int8)
    val = jnp.zeros(row_iota.shape[:1] + (128,), jnp.int32)
    if masked:
        hit = jnp.where((row >= 0) & (row < chunk_rows), 128, 0)
    for byte in range(4):
        sel = jax.lax.dot_general(
            one_hot, planes[byte],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # undo the -128 offset encoding; for masked chunks only where the
        # probe's row actually lives in this chunk (one_hot rows sum to 1
        # there and to 0 elsewhere)
        sel = sel + (hit if masked else 128)
        val = val | (sel << (8 * byte))
    lane_oh = (lane_iota == col).astype(jnp.int32)
    word_val = (val * lane_oh).sum(axis=1, keepdims=True)  # [B,1]
    return word_val, idx & jnp.uint32(31)


def _probe_mxu_i8_kernel(planes_ref, lo_ref, out_ref, *, mask: int,
                         hash_num: int):
    """Single-chunk fast path: whole filter's planes resident in VMEM."""
    lo = lo_ref[...]  # [B, h] uint32
    planes = planes_ref[...]
    b, rows = lo.shape[0], planes.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    acc = None
    for hi in range(hash_num):
        word_val, bitpos = _select_word(
            planes, lo[:, hi : hi + 1], row_iota, lane_iota,
            mask=mask, row0=0, chunk_rows=rows, masked=False,
        )
        ok = ((word_val.astype(jnp.uint32) >> bitpos) & jnp.uint32(1)) != 0
        acc = ok if acc is None else (acc & ok)
    out_ref[...] = acc


def _probe_mxu_i8_chunked_kernel(planes_ref, lo_ref, out_ref, acc_ref, *,
                                 mask: int, hash_num: int, chunk_rows: int,
                                 n_chunks: int):
    """Row-chunked variant for filters larger than one VMEM chunk.

    Each probe's row lives in exactly one chunk, so the bit test can run
    per chunk (non-hit chunks select an all-zero word, testing 0) and the
    per-hash results OR-accumulate as an h-bit mask in a [B, 1] scratch.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo = lo_ref[...]
    planes = planes_ref[...]
    b = lo.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (b, chunk_rows), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    found = jnp.zeros((b, 1), jnp.int32)
    for hi in range(hash_num):
        word_val, bitpos = _select_word(
            planes, lo[:, hi : hi + 1], row_iota, lane_iota,
            mask=mask, row0=c * chunk_rows, chunk_rows=chunk_rows, masked=True,
        )
        bit = ((word_val.astype(jnp.uint32) >> bitpos) & jnp.uint32(1))
        found = found | (bit.astype(jnp.int32) << hi)
    acc_ref[...] = acc_ref[...] | found

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[...] = acc_ref[...] == (1 << hash_num) - 1


def words_to_planes_i8(words_u32: np.ndarray) -> np.ndarray:
    """u32 word table -> [4, rows, 128] int8 byte planes, offset by -128."""
    w2 = np.asarray(words_u32).reshape(-1, 128)
    return np.stack(
        [
            (((w2 >> np.uint32(8 * b)) & np.uint32(0xFF)).astype(np.int32) - 128)
            .astype(np.int8)
            for b in range(4)
        ],
        axis=0,
    )


def probe_lo32_mxu_i8(planes_i8, bits: int, lo32, interpret: bool = False,
                      chunk_rows: int | None = None):
    """Probe [N, h] low-32 hashes via the chunked int8 MXU kernel."""
    with jax.enable_x64(False):
        return _probe_lo32_mxu_i8(
            planes_i8, bits, lo32, interpret, chunk_rows or MXU_CHUNK_ROWS
        )


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def _probe_lo32_mxu_i8(planes, bits: int, lo32, interpret: bool,
                       chunk_rows: int):
    assert bits & (bits - 1) == 0
    n, h = lo32.shape
    rows = planes.shape[1]
    chunk = min(rows, chunk_rows)
    n_chunks = -(-rows // chunk)
    if rows % chunk:
        planes = jnp.pad(planes, ((0, 0), (0, n_chunks * chunk - rows), (0, 0)))
    n_pad = -(-n // MXU_BLOCK) * MXU_BLOCK
    if n_pad != n:
        lo32 = jnp.pad(lo32, ((0, n_pad - n), (0, 0)))
    if n_chunks == 1:
        out = pl.pallas_call(
            functools.partial(_probe_mxu_i8_kernel, mask=bits - 1, hash_num=h),
            grid=(n_pad // MXU_BLOCK,),
            in_specs=[
                pl.BlockSpec((4, chunk, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MXU_BLOCK, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MXU_BLOCK, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
            interpret=interpret,
        )(planes, lo32)
        return out[:n, 0]
    out = pl.pallas_call(
        functools.partial(
            _probe_mxu_i8_chunked_kernel, mask=bits - 1, hash_num=h,
            chunk_rows=chunk, n_chunks=n_chunks,
        ),
        grid=(n_pad // MXU_BLOCK, n_chunks),
        in_specs=[
            pl.BlockSpec((4, chunk, 128), lambda i, c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MXU_BLOCK, h), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MXU_BLOCK, 1), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
        scratch_shapes=[pltpu.VMEM((MXU_BLOCK, 1), jnp.int32)],
        interpret=interpret,
    )(planes, lo32)
    return out[:n, 0]


def probe_windows_mxu(planes, bits: int, hash_num: int, k: int, codes_dev):
    """Dense-scan probe via the MXU kernel: XLA computes the window hashes
    (u64 path), the Pallas kernel probes their low-32 bits against the
    VMEM-resident filter.  Drop-in for bloom_jax.probe_kmers when
    bits <= 2^23 (the kernel's one-hot table budget)."""
    from . import nthash_jax as ntj

    lo = _window_lo32(codes_dev, k, hash_num)
    return probe_lo32_mxu(planes, bits, lo)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _window_lo32(codes, k: int, hash_num: int):
    from . import nthash_jax as ntj

    base = ntj.canonical_hashes(codes, k)
    hashes = ntj.multi_hashes(base, k, hash_num)
    return (hashes & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
