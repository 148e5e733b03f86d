"""Query-shaping helpers: time-series range API, result shaping, default
LIMIT semantics (SURVEY.md §1.5, §3.3).
"""
