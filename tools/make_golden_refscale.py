"""Generate the committed reference-scale golden fixtures.

Runs the full bulk pipeline (k=32/28/24/20 + sealer) on the bundled 1.1 MB
GoldRush draft and targeted mode on the 97 KB draft (deterministic derived
inputs — tests/refscale.py), and writes the gzip'd expected outputs under
tests/golden/.  Regenerate ONLY when an intentional behavior change is made;
tests/test_golden_refscale.py then pins byte equality.

Run: python tools/make_golden_refscale.py
"""

import gzip
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")

import refscale  # noqa: E402

from goldpolish_tpu.pipeline import bulk, targeted  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        cfg = refscale.build_bulk_inputs(tmp)
        bulk.run_bulk(cfg)
        data = open(cfg.output_seqs, "rb").read()
        with open(
            os.path.join(GOLDEN_DIR, "refscale_bulk_expected.fa.gz"), "wb"
        ) as raw, gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(data)
        print(f"bulk golden: {len(data)} bytes in {time.time()-t0:.1f}s")

        t0 = time.time()
        ncfg = refscale.build_bulk_noisy_inputs(tmp)
        bulk.run_bulk(ncfg)
        data = open(ncfg.output_seqs, "rb").read()
        with open(
            os.path.join(GOLDEN_DIR, "refscale_noisy_expected.fa.gz"), "wb"
        ) as raw, gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(data)
        print(f"noisy golden: {len(data)} bytes in {time.time()-t0:.1f}s")

        t0 = time.time()
        tcfg = refscale.build_targeted_inputs(tmp)
        targeted.run_targeted(tcfg)
        data = open(tcfg.output_seqs, "rb").read()
        with open(
            os.path.join(GOLDEN_DIR, "refscale_targeted_expected.fa.gz"), "wb"
        ) as raw, gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(data)
        print(f"targeted golden: {len(data)} bytes in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
