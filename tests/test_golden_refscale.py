"""Reference-scale golden tests: byte-exact outputs on the bundled drafts.

The counterpart of the reference's `cmp` golden tests
(tests/goldpolish_test.sh:11-18, goldpolish_target_ntlink_test.sh:12-16):
the full bulk pipeline (all four default k values + sealer) over the 1.1 MB
GoldRush draft, and targeted mode over the 97 KB draft, must reproduce the
committed expected FASTA byte-for-byte.  Inputs are regenerated
deterministically (tests/refscale.py); expected files were produced by
tools/make_golden_refscale.py.
"""

import gzip
import os

import pytest

import refscale
from goldpolish_tpu.pipeline import bulk, targeted

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.skipif(
    not os.path.exists(refscale.REF_BULK_DRAFT), reason="reference data absent"
)
@pytest.mark.slow
def test_bulk_refscale_golden(tmp_path):
    cfg = refscale.build_bulk_inputs(str(tmp_path))
    totals = bulk.run_bulk(cfg)
    assert totals["contigs"] == 152
    got = open(cfg.output_seqs, "rb").read()
    want = gzip.open(
        os.path.join(GOLDEN, "refscale_bulk_expected.fa.gz"), "rb"
    ).read()
    assert got == want, (
        f"bulk output diverged from golden ({len(got)} vs {len(want)} bytes)"
    )


@pytest.mark.skipif(
    not os.path.exists(refscale.REF_BULK_DRAFT), reason="reference data absent"
)
@pytest.mark.slow
def test_bulk_refscale_noisy_golden(tmp_path):
    """Degraded-read regime (7% indel-heavy errors — ONT-like): masked
    clusters dominate and most sites are unfixable; the byte-exact pin
    covers the pipeline's behavior closest to production noise (the
    reference's own e2e test uses real ONT reads, goldpolish_test.sh:6)."""
    cfg = refscale.build_bulk_noisy_inputs(str(tmp_path))
    totals = bulk.run_bulk(cfg)
    assert totals["contigs"] > 0
    got = open(cfg.output_seqs, "rb").read()
    want = gzip.open(
        os.path.join(GOLDEN, "refscale_noisy_expected.fa.gz"), "rb"
    ).read()
    assert got == want, (
        f"noisy bulk output diverged from golden ({len(got)} vs {len(want)})"
    )


@pytest.mark.skipif(
    not os.path.exists(refscale.REF_TARGET_DRAFT),
    reason="reference data absent",
)
def test_targeted_refscale_golden(tmp_path):
    cfg = refscale.build_targeted_inputs(str(tmp_path))
    res = targeted.run_targeted(cfg)
    assert res["gaps"] >= 5  # every large contig contributed a target window
    got = open(cfg.output_seqs, "rb").read()
    want = gzip.open(
        os.path.join(GOLDEN, "refscale_targeted_expected.fa.gz"), "rb"
    ).read()
    assert got == want, (
        f"targeted output diverged from golden ({len(got)} vs {len(want)})"
    )
