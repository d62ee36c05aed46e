"""Relational operators: enrich, route, aggregate, filters, plus the
training-data operators (dedup, similarity, text analysis)."""
