"""Model zoo: 15 classification families + 3 segmentation heads
(capability map: reference eqxvision/models/__init__.py:1-106)."""
from .classification import *  # noqa: F401,F403
from .segmentation import *  # noqa: F401,F403
from .registry import create_model, list_models
