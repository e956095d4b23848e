"""Reusable operator implementations (joins, dedup, similarity, text, multimodal).

Each module composes built-in DataFrame operations first, dropping to
Arrow-batched Pandas UDFs only where the built-ins cannot express the
semantics (SURVEY.md §7.1).
"""
