from .oracle import oracle_chunks, oracle_corpus_dedup, oracle_extract  # noqa: F401
