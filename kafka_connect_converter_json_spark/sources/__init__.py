"""Sources: deterministic CDC event generator (seeded, parallelism-
independent) and /root/testdata parquet readers."""
