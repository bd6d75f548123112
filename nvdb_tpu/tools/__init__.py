"""CLI tools mirroring the reference's executables (SURVEY.md §2.2):

reference binary        ->  python -m nvdb_tpu.tools.<name>
-----------------------------------------------------------
nvdb_dump               ->  dump
nvdb_sanity             ->  sanity
nvdb_search             ->  search
nvdb_bench              ->  bench
nvdb_gt_build           ->  gt_build
nvdb_quantize_i8        ->  quantize_i8
nvdb_convert_f16        ->  convert_bf16   (bf16 is the TPU-native half type)
nvdb_slice              ->  slice
nvdb_make_query         ->  make_query
nvdb_hnsw_build/search/eval -> pr_build / pr_eval  (partition-then-rerank)
nvdb_ivf_build/ivfpq_build  -> ivf_build
nvdb_ivf_eval           ->  ivf_eval
build_vecbin_chunked.py ->  synth (synthetic) / embed (model pipeline)
nvdb_cuda_sanity        ->  tpu_sanity
"""
