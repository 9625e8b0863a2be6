"""goldpolish_tpu — a TPU-native long-read genome polishing framework.

A from-scratch JAX/XLA/Pallas reimplementation of the GoldPolish
(GoldRush-Edit) assembly-polishing pipeline (reference: bcgsc/goldpolish).
The pipeline semantics are preserved — SeqIndex + read->contig mappings ->
per-batch multi-k Bloom filters -> ntEdit-style k-mer edit scan -> Sealer-style
de Bruijn gap fill -> ordered merge — but the compute path is redesigned for
TPU hardware:

 * ntHash rolling hashes are computed for *all* windows at once via a
   prefix-XOR scan + per-position split-rotations (O(log n) depth) instead of
   the reference's sequential O(n) roll (reference:
   subprojects/ntedit/lib/nthash.hpp:100-131).
 * Bloom filter probes are batched device gathers against HBM/VMEM-resident
   bit arrays instead of per-position pointer chasing.
 * The ntEdit editor runs as a two-phase engine: a batched detect+propose
   device pass over fixed-shape candidate lanes, then a cheap sequential
   host commit that replays the reference's exact edit-interaction semantics
   (reference: subprojects/ntedit/ntedit.cpp:1414-1771).
 * Process/FIFO orchestration (reference: scripts/goldpolish:446-583) is
   replaced by a single-process async engine; multi-host scale-out uses
   jax.sharding.Mesh + collectives instead of /dev/shm + named pipes.

64-bit integer support: ntHash is a 64-bit hash. We enable jax x64 at import
so jnp.uint64 is available on all backends (XLA emulates 64-bit integer ops
with 32-bit pairs on TPU).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first XLA compile through the tunneled TPU
# runtime is extremely slow (~minutes); cached recompiles are ~1s.
_cache_dir = _os.environ.get(
    "GPTPU_COMPILATION_CACHE", _os.path.expanduser("~/.cache/goldpolish_tpu_xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

__version__ = "0.1.0"
