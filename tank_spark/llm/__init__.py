"""LLM-data-pipeline operators (the north-star extension surface): text
analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, and event sessionization.

Cross-engine exactness toolkit used throughout (so every operator has a
DuckDB oracle twin):

* token/word extraction via ``regexp_extract_all`` (RE2/Java agree on the
  patterns used);
* hashing via ``md5`` (identical hex in any engine) — MinHash permutations
  are lexicographic mins of salted md5 strings; SimHash bits come from hex
  chars mapped through ``instr('0123456789abcdef', c)``;
* ratios/scores as divisions of exact integers (IEEE-identical);
* vector math as sequential left-fold dot products in both engines.
"""
