from radargnn_tpu.data.loader import GraphDataLoader, get_data_loaders  # noqa: F401
