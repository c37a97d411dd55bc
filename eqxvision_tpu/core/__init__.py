from . import init
from .module import (
    Module,
    field,
    static,
    replace,
    tree_at,
    tree_inference,
    iter_modules,
)
from .state import State, StatefulLayer, init_state, next_state_index
from .filters import (
    is_array,
    is_inexact_array,
    partition,
    combine,
    filter_jit,
    filter_grad,
    filter_value_and_grad,
    apply_updates,
)
