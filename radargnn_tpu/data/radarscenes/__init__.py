from radargnn_tpu.data.radarscenes.dataset_creation import (  # noqa: F401
    RadarScenesGraphDataset,
)
