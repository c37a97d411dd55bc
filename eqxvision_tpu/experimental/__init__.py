from .feature_extraction import (
    AuxData,
    IntermediateLayerGetter,
    IntermediateWrapper,
    intermediate_layer_getter,
)
