"""Query-registry family modules (r12 split of queries.py)."""
