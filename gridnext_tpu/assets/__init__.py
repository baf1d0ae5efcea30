"""Vendored constant data assets.

gene2vec_names.csv: the 16,906-symbol gene2vec vocabulary defining scBERT's
input order -- copied verbatim from the reference's data asset
(gridnext/llm/gene2vec_names.csv; consumed at llm/scbert.py:38-42). This is
a constant data table, not code; vendoring it is what makes
``load_gene2vec_names()`` work from a clean checkout (the reference cannot,
see SURVEY.md section 8).
"""
