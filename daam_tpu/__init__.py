"""daam_tpu — TPU-native diffusion attentive attribution maps.

Public API mirrors the reference DAAM package (``daam/__init__.py:1-6``): the
union of the heat-map, trace, experiment, evaluation, and utility surfaces.
"""

from ._version import __version__  # noqa: F401
from .utils import *  # noqa: F401,F403
from .evaluate import *  # noqa: F401,F403
from .experiment import *  # noqa: F401,F403
from .heatmap import *  # noqa: F401,F403
from .tokenization import *  # noqa: F401,F403

# Heavier layers (models/pipeline/trace) import jax/flax; they are part of the
# public API but imported lazily-tolerant so the pure layers work standalone.
try:  # pragma: no cover - exercised implicitly
    from .hook import *  # noqa: F401,F403
    from .trace import *  # noqa: F401,F403
except ImportError:  # jax/flax missing
    pass
