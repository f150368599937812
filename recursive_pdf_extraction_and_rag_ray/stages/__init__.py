"""Ray Data stages: callable classes for ``map_batches`` actor pools
(stateful, built once per actor — reference analog: per-process model
singletons, /root/reference/src/services/RAG/ocr_engine.py:55,69-91) and
stateless batch functions (pure tasks)."""
