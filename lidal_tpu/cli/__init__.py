"""Command-line interface mirroring the reference's entry points."""
