import numpy as np
from goldpolish_tpu.ops import bloom, nthash as nt
from goldpolish_tpu.bf_builder import BFBuilder


class FakeIndex:
    def __init__(self, seqs):
        self.seqs = seqs
    def get_seq_len(self, i):
        return len(self.seqs[i])
    def get_seq(self, i):
        return self.seqs[i]
    def get_phred_avg(self, i):
        return 40.0


class FakeMappings:
    def __init__(self, m):
        self.m = m
    def get_mappings(self, t):
        return self.m.get(t, [])


def test_device_build_superset_and_polishes():
    rng = np.random.default_rng(0)
    truth = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 60000)].tobytes()
    reads = {}
    rids = []
    rn = 0
    for rep in range(10):
        off = rep * 500
        for s in range(-off, 60000, 5000):
            a, e = max(0, s), min(60000, s + 10000)
            if e - a < 1000:
                continue
            reads[f"r{rn}"] = truth[a:e]
            rids.append(f"r{rn}")
            rn += 1
    tidx = FakeIndex({"c0": truth})
    ridx = FakeIndex(reads)
    builder = BFBuilder(
        tidx, ridx, FakeMappings({"c0": rids}), [32, 28],
        subsample_max_mapped_seqs_per_target_10kbp=1000.0,
    )
    host = builder.build_batch(["c0"])
    dev = builder.build_batch_device(["c0"])
    for k in (32, 28):
        hb, db = host.bf_for_k(k), dev.bf_for_k(k)
        assert hb.bytes == db.bytes
        ha = np.frombuffer(hb.array, np.uint8)
        da = np.frombuffer(db.array, np.uint8)
        # superset at the bit level: every host-set bit is device-set
        assert np.all((ha & ~da) == 0), k
        # and not wildly bigger
        extra = np.unpackbits(da & ~ha).sum()
        total = max(1, np.unpackbits(ha).sum())
        assert extra / total < 0.05, (k, extra, total)
    # the device-built BF polishes a mutated draft exactly
    from goldpolish_tpu.polish import ntedit_oracle as ne
    from goldpolish_tpu.polish.ntedit_tpu import NtEditTPU

    d = bytearray(truth)
    for p in range(500, 59000, 701):
        d[p] = ord("A") if d[p] != ord("A") else ord("G")
    cfg = ne.Config(k=32, h=4, use_ratio=True, mode=1, mask=1)
    out, _recs, _ed = NtEditTPU(cfg, dev.bf_for_k(32)).polish_contig(bytes(d))
    assert out.upper() == truth
