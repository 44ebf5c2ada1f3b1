"""Host-side I/O: FASTA / BED / VCF / SAM-BAM readers and writers.

The framework owns its whole I/O stack (the runtime image has neither pysam
nor samtools); BAM decoding is numpy-vectorized and feeds uint8 device tiles.
"""
