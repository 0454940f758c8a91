from radargnn_tpu.models.mlp import MLP, MaskedBatchNorm, torch_linear_init  # noqa: F401
from radargnn_tpu.models.layers import MPNNConv, RadarPointGNNConv  # noqa: F401
from radargnn_tpu.models.detnet import DetNet, create_detnet_state  # noqa: F401
