from .omni3d_eval import Omni3DEvaluator, Omni3DParams, evaluate_detections  # noqa: F401
