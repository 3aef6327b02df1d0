from .helpers import *
from . import profiling
from .torch_import import import_torch_checkpoint, convert_state_dict
from .debug import debug_nans, assert_finite, tree_norms
