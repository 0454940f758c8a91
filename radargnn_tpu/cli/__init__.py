from radargnn_tpu.cli import create_dataset, evaluate, train  # noqa: F401
