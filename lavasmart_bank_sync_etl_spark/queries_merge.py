"""Merge/join/dedup operator queries — populated in M2/M3."""
