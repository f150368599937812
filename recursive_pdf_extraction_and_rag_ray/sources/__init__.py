"""Sources: the synthetic Common-Crawl-style ``pages`` corpus generator and
parquet read helpers. Discovery in the reference was a recursive ``os.walk``
(/root/reference/src/services/RAG/convert_to_embeddings.py:505-518); here
discovery is the Parquet shard manifest."""
