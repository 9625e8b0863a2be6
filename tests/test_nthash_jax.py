"""JAX ntHash parity vs the NumPy closed form (itself pinned to the scalar
recurrences in test_nthash.py)."""

import numpy as np
import pytest

from goldpolish_tpu.ops import nthash as nt

ntj = pytest.importorskip("goldpolish_tpu.ops.nthash_jax")
import jax.numpy as jnp  # noqa: E402


@pytest.mark.parametrize("k", [20, 32, 64])
def test_jax_hashes_match_numpy(k):
    rng = np.random.default_rng(k)
    n = 257
    codes = np.frombuffer(
        bytes(rng.choice(list(b"ACGTacgtNRn")) for _ in range(n)), dtype=np.uint8
    )
    jf = np.asarray(ntj.forward_hashes(jnp.asarray(codes), k))
    jr = np.asarray(ntj.reverse_hashes(jnp.asarray(codes), k))
    jc = np.asarray(ntj.canonical_hashes(jnp.asarray(codes), k))
    assert np.array_equal(jf, nt.forward_hashes(codes, k))
    assert np.array_equal(jr, nt.reverse_hashes(codes, k))
    assert np.array_equal(jc, nt.canonical_hashes(codes, k))


def test_jax_batched_leading_dims():
    k = 16
    rng = np.random.default_rng(0)
    batch = np.frombuffer(
        bytes(rng.choice(list(b"ACGT")) for _ in range(4 * 100)), dtype=np.uint8
    ).reshape(4, 100)
    jc = np.asarray(ntj.canonical_hashes(jnp.asarray(batch), k))
    for b in range(4):
        assert np.array_equal(jc[b], nt.canonical_hashes(batch[b], k))


def test_jax_multi_hashes():
    k, m = 32, 5
    base = np.array([1, 2, 0xDEADBEEF], dtype=np.uint64)
    got = np.asarray(ntj.multi_hashes(jnp.asarray(base), k, m))
    want = nt.multi_hashes(base, k, m)
    assert np.array_equal(got, want)
