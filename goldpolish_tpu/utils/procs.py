"""Fork-pool worker setup shared by the batch pipeline and the engine.

Forked workers inherit heavyweight read-only state (Bloom filters, indexes,
configs) by copy-on-write through module globals — no pickling — which is
why the pools use the fork start method despite its sharp edges.  The two
edges are defused here:

* PR_SET_PDEATHSIG: workers block on the pool's call queue and would
  otherwise outlive a SIGTERM'd/killed parent as orphans (Linux-only,
  a no-op elsewhere).
* omp_set_num_threads(1): libgomp's thread team does not survive fork();
  a child entering an OpenMP parallel region with the inherited (now
  threadless) team state deadlocks on a futex.  With num_threads=1 the
  region executes inline without touching the team.  Cross-process
  parallelism replaces the in-process OpenMP threads.

Workers must also never touch the jax runtime (inherited device handles
and dispatch threads are invalid in the child); callers gate pool usage
to host-only code paths.
"""

from __future__ import annotations


def pool_worker_init() -> None:
    import ctypes
    import signal

    try:
        ctypes.CDLL(None).prctl(1, signal.SIGTERM)
    except Exception:  # noqa: BLE001
        pass
    try:
        ctypes.CDLL("libgomp.so.1").omp_set_num_threads(1)
    except Exception:  # noqa: BLE001
        pass
