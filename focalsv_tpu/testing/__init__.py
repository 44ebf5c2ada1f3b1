"""Test utilities: diploid genome + long-read simulator with exact truth.

The reference ships no unit tests and its end-to-end fixtures (chr21 BAM/FASTA)
were stripped from the snapshot (SURVEY.md section 4), so the framework carries
its own simulator: synthetic references, diploid SV/SNP haplotypes, reads with
exact true alignments, and truth VCFs for precision/recall gates.
"""
