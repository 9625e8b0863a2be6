"""Golden-file end-to-end test (the reference's test strategy, SURVEY §4).

The reference pins byte-identical polished FASTA on bundled inputs
(reference: tests/goldpolish_test.sh:11-18); its test reads are downloaded
at test time and unavailable here, so this repo vendors its own fixed
scenario (tests/golden/, generated once from a seeded RNG) with the expected
output committed.  Any change to hashing, Bloom semantics, editing decisions,
masking, sealing or ordering shows up as a byte diff.

All four golden contigs polish back to their exact truth sequences
(verified at generation time), so the expected file is also a correctness
anchor, not just a change detector.
"""

import filecmp
import os

import pytest

from goldpolish_tpu.config import PipelineConfig
from goldpolish_tpu.pipeline import bulk

GOLD = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("concurrency", [1, 3])
def test_bulk_golden_byte_identical(tmp_path, concurrency):
    out = str(tmp_path / "polished.fa")
    cfg = PipelineConfig(
        seqs_to_polish=os.path.join(GOLD, "draft.fa"),
        polishing_seqs=os.path.join(GOLD, "reads.fq"),
        output_seqs=out,
        k_values=[32, 28],
        batch_size=2,
        mappings_path=os.path.join(GOLD, "map.paf"),
        workspace=str(tmp_path),
        max_concurrent_batches=concurrency,
    )
    bulk.run_bulk(cfg)
    expected = os.path.join(GOLD, "expected_polished.fa")
    assert filecmp.cmp(out, expected, shallow=False), (
        "polished output differs from the golden bytes"
    )
