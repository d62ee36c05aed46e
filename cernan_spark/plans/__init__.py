"""End-to-end pipeline assembly + checkpoint/lineage bookkeeping."""
