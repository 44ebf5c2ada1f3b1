"""Region detection (step 0) and region tiling/cropping."""
