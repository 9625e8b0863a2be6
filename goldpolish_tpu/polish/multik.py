"""Multi-k ntEdit chain with the shrink-rollback guard.

The reference chains ntedit-gr over descending k values, feeding each run's
output to the next, with flags -d5 -i5 -m1 -a1 and X/Y ratios
(reference: scripts/goldpolish-ntedit:20-29; parameters from
scripts/goldpolish-make:10-16 — K="32 28 24 20", X=Y=0.5).  If the final
output shrank below 75% of the input FASTA's byte size, the whole chain is
rolled back and the input passes through unchanged
(reference: scripts/goldpolish-ntedit:31-40 — byte sizes of the FASTA files,
headers included).
"""

from __future__ import annotations

from dataclasses import dataclass

from .ntedit_oracle import Config
from .ntedit_tpu import NtEditTPU

DEFAULT_K_VALUES = [32, 28, 24, 20]  # reference goldpolish-make:10
ROLLBACK_RATIO = 0.75


def ntedit_config_for_k(k: int, x: float = 0.5, y: float = 0.5,
                        hash_num: int = 4) -> Config:
    """The per-k editor config the pipeline uses (goldpolish-ntedit flags)."""
    return Config(
        k=k, h=hash_num, max_insertions=5, max_deletions=5,
        missing_ratio=x, edit_ratio=y, use_ratio=True,
        mode=1, mask=1,
    )


def _fasta_bytes(records: list[tuple[str, str]]) -> int:
    """Byte size of the single-line FASTA rendering (headers + newlines),
    matching the reference's `wc -c` comparison."""
    return sum(len(h) + len(s) + 3 for h, s in records)  # '>' + 2 newlines


@dataclass
class MultiKStats:
    per_k: list[dict]
    rolled_back: bool = False


def polish_multik(records: list[tuple[str, str]], batch_bfs, k_values=None,
                  x: float = 0.5, y: float = 0.5, backend: str = "numpy",
                  engines: dict | None = None):
    """Run the multi-k editing chain over a batch of (header, seq) records.

    batch_bfs: BatchBFs (bf_builder) holding one plain BF per k.
    engines: optional {k: NtEditTPU} cache — reuse across batches when the
    BFs are per-batch (engines must then be rebuilt); mostly for tests.
    Returns (records_out, MultiKStats).
    """
    ks = list(k_values) if k_values is not None else list(batch_bfs.k_values)
    cur = records
    stats = MultiKStats(per_k=[])
    for k in ks:
        bf = batch_bfs.bf_for_k(k)
        if engines is not None and k in engines:
            eng = engines[k]
        else:
            eng = NtEditTPU(ntedit_config_for_k(k, x, y, hash_num=bf.hash_num),
                            bf, backend=backend)
            if engines is not None:
                engines[k] = eng
        nxt = []
        kstat = {"k": k, "subs": 0, "ins": 0, "dels": 0, "masked": 0}
        results = eng.polish_many([seq.encode() for _h, seq in cur])
        for (header, _seq), (out, _recs, ed) in zip(cur, results):
            kstat["subs"] += ed.n_subs
            kstat["ins"] += ed.n_ins
            kstat["dels"] += ed.n_dels
            kstat["masked"] += ed.n_masked
            nxt.append((header, out.decode("ascii")))
        stats.per_k.append(kstat)
        cur = nxt
    if _fasta_bytes(cur) / max(1, _fasta_bytes(records)) < ROLLBACK_RATIO:
        stats.rolled_back = True
        return records, stats
    return cur, stats
