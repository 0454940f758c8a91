from radargnn_tpu.ops.segment import (  # noqa: F401
    segment_max, segment_sum, segment_mean, segment_reduce, gather,
)
from radargnn_tpu.ops.knn import (  # noqa: F401
    knn_graph, radius_graph, nearest_neighbor,
    knn_edges_host, radius_edges_host,
)
