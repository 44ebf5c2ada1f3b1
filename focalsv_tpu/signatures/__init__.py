"""SV signature extraction, clustering, and haplotype pairing."""
