"""Host-side utilities: metrics, plotting, checkpoints, JPEG entropy
coding, zigzag scans, misc helpers, and default paths."""
