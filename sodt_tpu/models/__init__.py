from .compiler import build_model, parse_config, MODULE_REGISTRY
from .detect import Detect, decode_detections
from .model import DetectionModel
