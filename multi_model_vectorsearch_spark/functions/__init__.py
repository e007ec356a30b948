from multi_model_vectorsearch_spark.functions.fixedpoint import (  # noqa: F401
    snap,
    snap_sql,
)
from multi_model_vectorsearch_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
