from .store import VecStore
from .flat import FlatIndex
from .pq_table import PQTable
from .ivf import IVFIndex
from .pq_codes import PQCodesIndex
from .ivfpq import IVFPQIndex
from .hnsw import HNSWIndex
from .kmeans import KMeans
from .u8 import U8VecSet, FlatIndexU8
from . import base, native

__all__ = [
    "VecStore",
    "FlatIndex",
    "PQTable",
    "IVFIndex",
    "PQCodesIndex",
    "IVFPQIndex",
    "HNSWIndex",
    "KMeans",
    "U8VecSet",
    "FlatIndexU8",
    "base",
    "native",
]
