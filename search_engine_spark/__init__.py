"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

Re-implements the capabilities of the reference engine
(elnaradin/search-engine, a Java/Spring/MySQL web search engine — see
SURVEY.md) as idiomatic, distributed Spark jobs:

- corpus ingestion over transcript tables (conv_id, turn_idx, role, text,
  tool, ts),
- vectorized tokenize/lemmatize analysis (pandas/Arrow UDFs, no per-row
  Python),
- inverted-index build (term -> delta-encoded varbyte-compressed posting
  blocks with block-max metadata) with explicit salting for hot-term skew,
- multi-term top-k queries under BM25 and the reference's TF-sum relevance
  (IndexRepository.java:14-20 semantics), rank-identical with deterministic
  tie-breaks,
- checkpoint/resume via a per-partition build manifest,
- training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing).

Everything is DataFrame-first: Catalyst plans the physical execution; the
only Python on the hot path is Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
