from nvdb_tpu.index.flat import FlatIndex  # noqa: F401
