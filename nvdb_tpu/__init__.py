"""nvdb_tpu — a TPU-native vector index-and-query engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
C++/AVX2/CUDA benchmark `ntnu-yjyjames/nano-vectordb` (see SURVEY.md):

- ``formats``   — vecbin64 / raw12 / gtbin on-disk formats, bit-compatible with the
                  reference (vecbin_format.h:17-29, gtbin_format.h:18-30), plus
                  synthetic-data generation and dtype converters.
- ``store``     — HBM-resident, optionally device-sharded embedding store (the TPU
                  analogue of the mmap VectorDataset, vector_dataset.cpp:24-94).
- ``kernels``   — Pallas fused scan+top-k kernels and pure-jnp oracle ops (the TPU
                  analogue of simd_dot.cpp + topK.h + flat_index_*.cpp + cuda_refine.cu).
- ``index``     — Flat, IVF-Flat, IVF-PQ/OPQ(+refine), and partition-then-rerank
                  indexes (replacing FAISS and hnswlib).
- ``dist``      — device-mesh sharding and cross-device top-k merge.
- ``eval``      — benchmark harness with the reference's metric vocabulary
                  (avg/QPS/p50/p95/p99, bytes_per_query, effective bandwidth,
                  recall@k, RESULT lines; nvdb_bench.cpp:369-425).
- ``tools``     — CLI entry points mirroring the reference's 16 executables.
"""

__version__ = "0.1.0"

from nvdb_tpu.formats import vecbin, gtbin  # noqa: F401
from nvdb_tpu.store import VectorStore  # noqa: F401
from nvdb_tpu.index.flat import FlatIndex, build_ground_truth  # noqa: F401
from nvdb_tpu.index.ivf_flat import IVFFlatIndex  # noqa: F401
from nvdb_tpu.index.ivf_pq import IVFPQIndex  # noqa: F401
from nvdb_tpu.index.partition import PartitionRerankIndex  # noqa: F401
