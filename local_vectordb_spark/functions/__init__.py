from local_vectordb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)
