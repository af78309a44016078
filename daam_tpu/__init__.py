"""daam_tpu — TPU-native diffusion attentive attribution maps.

Public API mirrors the reference DAAM package (``daam/__init__.py:1-6``): the
union of the heat-map, trace, hook, experiment, evaluation, and utility
surfaces, plus the TPU-native pipeline/model/parallel layers.
"""

from ._version import __version__  # noqa: F401
from .utils import *  # noqa: F401,F403
from .evaluate import *  # noqa: F401,F403
from .experiment import *  # noqa: F401,F403
from .heatmap import *  # noqa: F401,F403
from .tokenization import *  # noqa: F401,F403
from .hook import *  # noqa: F401,F403
from .trace import *  # noqa: F401,F403


def __getattr__(name):
    """Lazy access to the heavier pipeline/model layers."""
    if name in ('StableDiffusionPipeline', 'PipelineOutput'):
        from .pipeline import sd
        return getattr(sd, name)
    if name == 'StableDiffusionXLPipeline':
        from .pipeline.sdxl import StableDiffusionXLPipeline
        return StableDiffusionXLPipeline
    if name == 'DiffusionPipeline':
        # Familiar alias for users coming from the reference stack:
        # ``DiffusionPipeline.from_pretrained(...)`` dispatches to the right
        # pipeline class from the checkpoint/preset.
        from .pipeline.sd import StableDiffusionPipeline
        return StableDiffusionPipeline
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
