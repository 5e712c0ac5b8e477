"""Distributed index construction (tokenize -> postings -> segments)."""
