"""Scalar function layer (the reference's Pig EvalFunc surface, Spark-first)."""

from ia_hadoop_tools_spark.functions.surt import surt_expr, surt_udf  # noqa: F401
from ia_hadoop_tools_spark.functions.datetime14 import (  # noqa: F401
    ts14_to_epoch_millis,
    ts14_to_timestamp,
    timestamp_to_ts14,
)
from ia_hadoop_tools_spark.functions.jsonfns import (  # noqa: F401
    json_to_map,
    map_to_json,
    parse_petabox_metadata,
)
from ia_hadoop_tools_spark.functions.urlfns import url_resolve_udf  # noqa: F401
from ia_hadoop_tools_spark.functions.hashfns import (  # noqa: F401
    hash32,
    minhash_permutations,
)
from ia_hadoop_tools_spark.functions.vectorfns import (  # noqa: F401
    cosine_similarity,
    cosine_similarity_arrow,
    dot_product,
    dot_product_arrow,
    l2_norm,
    l2_norm_arrow,
    plane_dots_arrow,
)
