"""Pallas TPU kernel: Bloom filter probe with the filter resident in VMEM.

The plain per-batch Bloom filter is 512 KiB (reference:
src/goldpolish_targeted_bfs.cpp:271) — it fits comfortably in VMEM
(~16 MB/core), so the probe becomes on-chip random access instead of XLA's
HBM gathers.  The kernel receives the *low 32 bits* of every derived hash
(the bit count is a power of two <= 2^32, so the modulo only touches the
low word — hashes are derived u64 ntHash values computed by the XLA path),
gathers the containing u32 words from the VMEM-resident filter, tests the
bits and AND-reduces across the hash_num axis.

Grid: one program per row-block of hashes; the filter block is broadcast
(same block for every program) so Mosaic keeps it in VMEM across steps.

Fallback: `probe_lo32_reference` is the jnp equivalent used for interpret-
mode tests and for backends where the Mosaic gather is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 1024  # hash tuples per grid step


def _probe_kernel(words_ref, lo_ref, out_ref, *, mask: int, hash_num: int):
    lo = lo_ref[...]  # [BLOCK_ROWS, hash_num] uint32
    idx = lo & jnp.uint32(mask)
    word_idx = (idx >> jnp.uint32(5)).astype(jnp.int32)
    # Mosaic supports 2D gathers only: view the word table as [rows, 128]
    # lanes, gather whole rows by index, then select the lane with
    # take_along_axis (both are supported 2D forms)
    words = words_ref[...]  # [W] uint32
    w2 = words.reshape(-1, 128)
    n_flat = word_idx.shape[0] * word_idx.shape[1]
    row = jnp.broadcast_to(
        (word_idx >> 7).reshape(-1, 1), (n_flat, 128)
    ).astype(jnp.int32)
    col = (word_idx & 127).reshape(-1, 1)      # [BLOCK*h, 1]
    rows = jnp.take_along_axis(w2, row, axis=0)  # [BLOCK*h, 128]
    gathered = jnp.take_along_axis(rows, col, axis=1).reshape(word_idx.shape)
    bit = (gathered >> (idx & jnp.uint32(31))) & jnp.uint32(1)
    out_ref[...] = (bit != 0).all(axis=-1)


def probe_lo32_pallas(words: jnp.ndarray, bits: int, lo32: jnp.ndarray) -> jnp.ndarray:
    """Probe [N, hash_num] low-32-bit hash values against the BF words.

    bits must be a power of two (default sizing guarantees it).
    Returns bool[N].  Runs under a local x64-disable so jnp index helpers
    inside the kernel stay 32-bit (Mosaic rejects 64-bit types).
    """
    from jax.experimental import disable_x64

    with disable_x64():
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
        out_specs=pl.BlockSpec((BLOCK_ROWS,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.bool_),
    )(words, lo32)
    return out[:n]


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
