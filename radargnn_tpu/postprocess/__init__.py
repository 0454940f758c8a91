from radargnn_tpu.postprocess.extraction import (  # noqa: F401
    BoxArray, Postprocessor, PredictionExtractor, GroundTruthExtractor,
    BoxSuppressor, decode_boxes_to_corners,
)
from radargnn_tpu.postprocess.inference import Predictor  # noqa: F401
from radargnn_tpu.postprocess.mean_ap import MeanAveragePrecision  # noqa: F401
from radargnn_tpu.postprocess.segmentation_metrics import (  # noqa: F401
    ObjectDetectionMetrics, SegmentationMetrics,
)
from radargnn_tpu.postprocess.evaluation import (  # noqa: F401
    Evaluator, RadarscenesEvaluator, evaluation_selector,
    get_new_evaluation_folder_path,
)
