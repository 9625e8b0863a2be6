"""Pallas Bloom-probe kernel vs host reference (interpret mode on CPU)."""

import numpy as np
import pytest

from goldpolish_tpu.ops import bloom, nthash as nt

bp = pytest.importorskip("goldpolish_tpu.ops.bloom_pallas")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


def _setup(n_kmers=3000, k=32, h=4):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT")) for _ in range(n_kmers + k))
    bf = bloom.BloomFilter(bloom.DEFAULT_BF_BYTES, h, k)
    hashes = nt.multi_hashes(nt.canonical_hashes(nt.encode(seq), k), k, h)
    bf.insert(hashes[::2])
    return bf, hashes


def test_lo32_equivalence():
    """Probing with only the low 32 bits equals full-u64 probing when the
    bit count is a power of two (h % 2^m only reads low bits)."""
    bf, hashes = _setup()
    lo = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    want = bf.contains(hashes)
    got = np.asarray(
        bp.probe_lo32_reference(jnp.asarray(bf.words_u32()), int(bf.bits), jnp.asarray(lo))
    )
    assert np.array_equal(got, want)


def test_pallas_kernel_interpret_matches():
    """Kernel logic vs reference under the pallas interpreter."""
    bf, hashes = _setup(n_kmers=2500)
    lo = jnp.asarray((hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    words = jnp.asarray(bf.words_u32())
    import functools

    n, h = lo.shape
    n_pad = -(-n // bp.BLOCK_ROWS) * bp.BLOCK_ROWS
    lo_p = jnp.pad(lo, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            bp._probe_kernel, mask=int(bf.bits) - 1, hash_num=h
        ),
        grid=(n_pad // bp.BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((words.shape[0],), lambda i: (0,)),
            pl.BlockSpec((bp.BLOCK_ROWS, h), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bp.BLOCK_ROWS, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
        interpret=True,
    )(words, lo_p)
    got = np.asarray(out)[:n, 0]
    want = bf.contains(hashes)
    assert np.array_equal(got, want)


def test_mxu_kernel_interpret_matches():
    """MXU one-hot lookup kernel vs host reference (interpreter)."""
    import functools

    bf, hashes = _setup(n_kmers=2100)
    lo = jnp.asarray((hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    planes = bp.words_to_planes(jnp.asarray(bf.words_u32()))
    n, h = lo.shape
    n_pad = -(-n // bp.MXU_BLOCK) * bp.MXU_BLOCK
    lo_p = jnp.pad(lo, ((0, n_pad - n), (0, 0)))
    rows = planes.shape[1]
    out = pl.pallas_call(
        functools.partial(
            bp._probe_mxu_kernel, mask=int(bf.bits) - 1, hash_num=h, rows=rows
        ),
        grid=(n_pad // bp.MXU_BLOCK,),
        in_specs=[
            pl.BlockSpec((4, rows, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((bp.MXU_BLOCK, h), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bp.MXU_BLOCK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
        interpret=True,
    )(planes, lo_p)
    got = np.asarray(out)[:n, 0]
    want = bf.contains(hashes)
    assert np.array_equal(got, want)


def test_mxu_i8_kernel_interpret_matches():
    """The production int8 one-hot kernel (single-chunk and chunked paths)
    matches the host filter bit-for-bit (interpret mode on CPU)."""
    bf, hashes = _setup(n_kmers=2500)
    lo = jnp.asarray((hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    want = bf.contains(hashes)
    planes = jnp.asarray(bp.words_to_planes_i8(bf.words_u32()))
    got = np.asarray(
        bp.probe_lo32_mxu_i8(planes, int(bf.bits), lo, interpret=True)
    )
    assert np.array_equal(got, want)
    # chunked path: shrink the chunk size so this filter needs several
    got2 = np.asarray(
        bp.probe_lo32_mxu_i8(
            planes, int(bf.bits), lo, interpret=True,
            chunk_rows=max(1, (bf.bytes // 512) // 4),
        )
    )
    assert np.array_equal(got2, want)
