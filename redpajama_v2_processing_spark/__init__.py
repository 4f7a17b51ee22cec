"""PySpark-native quality-filter / dedup engine.

A from-scratch, Spark-first re-expression of the semantics of
``rakseli/redpajama-v2-processing`` (reference at ``/root/reference``):
language identification, RedPajama-v2-style heuristic quality signals,
perplexity scoring, PII/toxicity scrubbing, exact dedup (hash/Bloom +
anti-join) and fuzzy dedup (MinHash-LSH band-bucket shuffle + distributed
connected components), over an Iceberg-style ``pages`` table of
Common-Crawl-like web pages.

Design theses (vs the reference's single-node HF-datasets pipeline):

* everything is a declarative DataFrame plan -> Catalyst prunes/pushes/plans;
* no per-row Python: native ``pyspark.sql.functions`` first, Arrow-batched
  pandas UDFs only where natives cannot express the semantics;
* the reference's hand-rolled "build a python set, stream-filter" joins
  (src/filter_exact_duplicates.py:62-132) become broadcast/shuffle
  semi- and anti-joins chosen by AQE;
* the reference's in-RAM union-find (src/union_find.py:45-81) becomes the
  large-star/small-star distributed connected-components fixpoint;
* the reference's manual sharding/partial-dedup rounds
  (src/minhashlsh_partial.py:165-217) disappear: one shuffle over the full
  corpus, spill-safe.
"""

__version__ = "0.1.0"
