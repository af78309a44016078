from .schedulers import (DDIMScheduler, PNDMScheduler, EulerDiscreteScheduler,
                         DPMSolverMultistepScheduler, get_scheduler)  # noqa: F401
from .sd import StableDiffusionPipeline, PipelineOutput  # noqa: F401
from .sdxl import StableDiffusionXLPipeline  # noqa: F401
