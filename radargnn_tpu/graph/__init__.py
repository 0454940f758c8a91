from radargnn_tpu.graph.batch import GraphBatch, GraphSample, pad_sample, stack_samples  # noqa: F401
from radargnn_tpu.graph.features import (  # noqa: F401
    point_pair_features, edge_features, node_features, node_degrees,
)
from radargnn_tpu.graph.build import build_geometric_graph, GeometricGraphArrays  # noqa: F401
