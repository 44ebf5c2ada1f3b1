"""Per-region SNV detection + read haplotyping (the longshot replacement)."""
