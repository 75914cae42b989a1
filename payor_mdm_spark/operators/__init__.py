"""Pipeline operators: rollup -> staging -> blocking -> scoring ->
candidates -> clustering -> survivorship -> golden/xref/hierarchy, plus
training-data ops (dedup, similarity search, text analysis, multimodal)."""
