"""Training-data operators layered on the engine: text analysis, dedup
(exact / MinHash-LSH / SimHash / embedding-cosine), similarity search, and
multimodal column plumbing. All Ray-Data-first: vectorized ``map_batches``
stages, partial-aggregation before any shuffle, broadcast small sides."""
