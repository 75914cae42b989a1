"""payor_mdm_spark — a PySpark-native entity-resolution / MDM engine.

A from-scratch reimplementation of the capabilities of the
``prometheuswilson05/payor-mdm`` reference (a dbt-on-Snowflake MDM pipeline),
re-expressed Spark-first over tables of multi-turn conversation transcripts:

* rollup of transcript turns to one canonical entity record per ``conv_id``
  (stable ``turn_idx`` ordering, per-turn text preserved verbatim),
* standardization (pure column expressions, whole-stage-codegen friendly),
* multi-pass blocking (key-equality passes rewritten as unions of equi
  self-joins, sorted-neighborhood window pass, MinHash-LSH pass; hot-key
  salting + block-size caps),
* pairwise ensemble scoring (deterministic rules short-circuit; string
  similarity kernels run in Arrow-vectorized pandas UDFs — no per-row Python),
* transitive clustering via distributed hash-min label propagation,
* survivorship + golden-record assembly in a single aggregation,
* xref / hierarchy inference / audit, and
* large-scale training-data ops (dedup, ANN similarity search, text
  analysis, multimodal plumbing).

Everything here derives from public knowledge: the PySpark API and the
reference repo's observable behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"
