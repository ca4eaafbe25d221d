"""local_vectordb_spark — a PySpark-native analytics engine.

A from-scratch re-imagination of the capabilities of
``aaronbannin/local-vectordb`` (a local FastAPI vector database with
brute-force / IVF / NSW kNN indexes; see SURVEY.md) as an idiomatic,
100 TB-scale Spark engine:

- entity tables (libraries / documents / chunks) as Parquet-backed
  DataFrames with batch CRUD semantics (append / merge / anti-join),
- cosine scoring as native Catalyst array expressions with distributed
  top-k,
- MLlib KMeans for IVF-style cluster-pruned search,
- deterministic random-hyperplane LSH in place of sequential NSW graph
  traversal,
- LLM-data-pipeline operators beyond the reference surface: exact and
  near-duplicate dedup (MinHash, SimHash, n-gram Jaccard, embedding
  cosine), bulk similarity joins, text analytics, event windowing and
  sessionization, multimodal binary-column plumbing.

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and optimized by Catalyst; Python UDFs appear only as
Arrow-batched pandas UDFs off the hot path.
"""

__version__ = "0.1.0"
