from .fpn import FPN  # noqa: F401
from .resnet import ResNetBottomUp  # noqa: F401
from .dla import DLABottomUp  # noqa: F401
from .build import build_backbone, BACKBONE_REGISTRY  # noqa: F401
