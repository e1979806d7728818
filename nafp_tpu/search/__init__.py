from nafp_tpu.search.index import (FlatIndex, IVFPQIndex, IVFSQ8Index,
                                   get_index, kmeans)
from nafp_tpu.search.evaluate import eval_fingerprints
from nafp_tpu.search.minisearch import mini_search_eval
from nafp_tpu.search.sharded import ShardedFlatIndex, ShardedIVFSQ8Index

__all__ = ["FlatIndex", "IVFPQIndex", "IVFSQ8Index", "ShardedFlatIndex",
           "ShardedIVFSQ8Index", "get_index", "kmeans", "eval_fingerprints",
           "mini_search_eval"]
