"""omchat_tpu — TPU-native multimodal inference framework with OmChat's capabilities.

Built from scratch on JAX/XLA/Pallas/pjit.  See SURVEY.md for the structural
analysis of the reference (om-ai-lab/OmChat) whose behavior contract this
framework reproduces.
"""

__version__ = "0.1.0"

from omchat_tpu.config import (  # noqa: F401
    GenerationConfig,
    OmChatConfig,
    ProjectorConfig,
    TextConfig,
    VisionConfig,
)
from omchat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX  # noqa: F401
