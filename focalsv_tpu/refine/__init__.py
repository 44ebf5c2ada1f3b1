"""Step-5 refinement: signature support, coverage-band filter, GT correction."""
