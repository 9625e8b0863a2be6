"""Standalone tool CLIs mirroring the reference's per-stage binaries.

The reference ships each pipeline stage as its own executable
(goldpolish-index, goldpolish-targeted-bfs, ntedit-gr, sealer-gr,
goldpolish-mask, goldpolish-to-upper — SURVEY.md section 2); these modules
expose the same stages as `python -m goldpolish_tpu.tools.<name>` so the
pieces compose outside the bundled pipeline too.
"""
