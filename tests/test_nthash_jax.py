"""JAX ntHash parity vs the NumPy closed form (itself pinned to the scalar
recurrences in test_nthash.py)."""

import numpy as np
import pytest

from goldpolish_tpu.ops import nthash as nt

ntj = pytest.importorskip("goldpolish_tpu.ops.nthash_jax")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# eager u64 dispatch is pathologically slow — always test through jit
_fwd = jax.jit(ntj.forward_hashes, static_argnums=1)
_rev = jax.jit(ntj.reverse_hashes, static_argnums=1)


@pytest.mark.parametrize("k", [20, 32, 64])
def test_jax_hashes_match_numpy(k):
    rng = np.random.default_rng(k)
    n = 257
    codes = np.frombuffer(
        bytes(rng.choice(list(b"ACGTacgtNRn")) for _ in range(n)), dtype=np.uint8
    )
    jf = np.asarray(_fwd(jnp.asarray(codes), k))
    jr = np.asarray(_rev(jnp.asarray(codes), k))
    jc = np.asarray(ntj.canonical_hashes_jit(jnp.asarray(codes), k))
    assert np.array_equal(jf, nt.forward_hashes(codes, k))
    assert np.array_equal(jr, nt.reverse_hashes(codes, k))
    assert np.array_equal(jc, nt.canonical_hashes(codes, k))


def test_jax_batched_leading_dims():
    k = 16
    rng = np.random.default_rng(0)
    batch = np.frombuffer(
        bytes(rng.choice(list(b"ACGT")) for _ in range(4 * 100)), dtype=np.uint8
    ).reshape(4, 100)
    jc = np.asarray(ntj.canonical_hashes_jit(jnp.asarray(batch), k))
    for b in range(4):
        assert np.array_equal(jc[b], nt.canonical_hashes(batch[b], k))


def test_jax_multi_hashes():
    k, m = 32, 5
    base = np.array([1, 2, 0xDEADBEEF], dtype=np.uint64)
    got = np.asarray(ntj.multi_hashes_jit(jnp.asarray(base), k, m))
    want = nt.multi_hashes(base, k, m)
    assert np.array_equal(got, want)
