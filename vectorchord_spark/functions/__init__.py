from vectorchord_spark.functions.distances import (
    vec_lit,
    dot,
    l2_squared,
    l2,
    ip,
    cosine_distance,
    output_distance,
    maxsim,
    sphere_contains,
    norm,
    normalize,
)
from vectorchord_spark.functions.quantize import (
    quantize_to_rabitq,
    dequantize_to_vector,
    rabitq_distance,
    register_sql_functions,
)

__all__ = [
    "vec_lit",
    "dot",
    "l2_squared",
    "l2",
    "ip",
    "cosine_distance",
    "output_distance",
    "maxsim",
    "sphere_contains",
    "norm",
    "normalize",
    "quantize_to_rabitq",
    "dequantize_to_vector",
    "rabitq_distance",
    "register_sql_functions",
]
