from .configs import (CLIPTextConfig, UNetConfig, VAEConfig, PipelineConfig,
                      get_pipeline_config, MODEL_PRESETS)  # noqa: F401
from .clip import CLIPTextEncoder  # noqa: F401
from .unet import UNet2DConditionModel  # noqa: F401
from .vae import AutoencoderKL  # noqa: F401
