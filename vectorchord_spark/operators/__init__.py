from vectorchord_spark.operators.graph import VamanaIndex, VamanaOptions
from vectorchord_spark.operators.ivf import IvfIndex, IvfOptions
from vectorchord_spark.operators.knn import knn_exact
from vectorchord_spark.operators.maxsim import maxsim_search

__all__ = [
    "IvfIndex",
    "IvfOptions",
    "VamanaIndex",
    "VamanaOptions",
    "knn_exact",
    "maxsim_search",
]
