"""LLM-data-pipeline operators (SURVEY.md §2.12, the north-star
extensions beyond reference parity).

The reference stops at BI aggregates over the master table; a modern
large-scale training-data pipeline additionally needs deduplication,
text analysis, similarity search, and multimodal column handling.
Everything here is expressed against ordinary DataFrames over the
``documents`` (``doc_id, text, lang, source, n_chars``) and
``embeddings`` (``vec_id, embedding: array<float>, label``) tables:

- :mod:`.text` — tokenization, text statistics, language-ID heuristic,
  quality scoring, shingle fingerprints / MinHash signatures.
- :mod:`.dedup` — exact content-hash dedup, banded MinHash-LSH
  near-dup join, SimHash bucketing, ``pyspark.ml`` MinHashLSH variant.
- :mod:`.vectors` — cosine similarity, brute-force top-k retrieval,
  sign-LSH (random hyperplane) bucketed ANN.
- :mod:`.multimodal` — opaque binary columns + typed metadata with
  Arrow-batched ``mapInPandas`` decode plumbing (decoders stubbed:
  image/audio libs are out of scope, the Spark-side contract is real).

Scale stance: no all-pairs cross joins anywhere — candidate
generation is always bucket-/band-partitioned so the shuffle key
carries the similarity structure; scoring UDFs are avoided in favor
of codegen'd higher-order functions (``transform``/``aggregate``/
``zip_with``).
"""

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup, multimodal, text, vectors

__all__ = ["dedup", "multimodal", "text", "vectors"]
