from nvdb_tpu.store.store import VectorStore  # noqa: F401
