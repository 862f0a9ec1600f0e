"""DOVE-TPU: one-step diffusion video super-resolution, TPU-native.

Public API surface:

    from dove_tpu import DovePipeline, PipelineConfig, cogvideox1_5_5b
    from dove_tpu.weights import load_dit, load_vae, load_prompt_embedding
    from dove_tpu.train.trainer import get_model_cls
"""

from dove_tpu.config import (
    DiTConfig,
    PipelineConfig,
    SchedulerConfig,
    VAEConfig,
    cogvideox1_5_5b,
    cogvideox_2b,
    pipeline_config_from_pretrained,
    tiny_test,
)
from dove_tpu.pipeline import DovePipeline

__version__ = "0.1.0"

__all__ = [
    "DiTConfig",
    "DovePipeline",
    "PipelineConfig",
    "SchedulerConfig",
    "VAEConfig",
    "cogvideox1_5_5b",
    "cogvideox_2b",
    "pipeline_config_from_pretrained",
    "tiny_test",
    "__version__",
]
