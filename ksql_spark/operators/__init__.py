"""Reusable column-level / DataFrame-level operators beyond plain SQL:
text analysis, vector math, dedup strategies, multimodal plumbing.
All [EXT] per SURVEY.md §2.K — mandated by the LLM-data-pipeline north star.
"""
