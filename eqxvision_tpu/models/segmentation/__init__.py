from ._utils import _SimpleSegmentationModel
from .deeplabv3 import ASPP, DeepLabHead, DeepLabV3, deeplabv3
from .fcn import FCN, FCNHead, fcn
from .lraspp import LRASPP, LRASPPHead, lraspp_mobilenet_v3_large
