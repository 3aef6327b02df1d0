"""factorizer_tpu: a TPU-native (JAX/Flax/Pallas) framework with the
capabilities of pashtari/factorizer.

Public API mirrors the reference's flat ``factorizer.*`` namespace
(reference: factorizer/__init__.py).  Conventional alias: ``import
factorizer_tpu as ftx``.
"""

from .utils.helpers import *  # noqa: F401,F403
from .ops import *  # noqa: F401,F403
from .factorization import *  # noqa: F401,F403
from .layers import *  # noqa: F401,F403
from .models import *  # noqa: F401,F403

__version__ = "0.1.0"
