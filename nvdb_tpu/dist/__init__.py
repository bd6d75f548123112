from nvdb_tpu.dist.mesh import row_mesh, row_sharding, replicated  # noqa: F401
from nvdb_tpu.dist.sharded import sharded_flat_topk, ShardedFlatIndex  # noqa: F401
