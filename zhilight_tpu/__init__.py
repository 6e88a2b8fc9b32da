"""zhilight_tpu — a TPU-native LLM serving framework.

Brand-new JAX/XLA/Pallas implementation with the capability set of the
zhihu/ZhiLight CUDA engine: continuous-batching OpenAI-compatible serving,
paged KV cache with prefix reuse, chunked prefill, LLaMA/Qwen/Mixtral/
DeepSeek-V2/V3 model families (MoE + MLA), weight quantization
(INT8/GPTQ/AWQ/FP8), and tensor/expert parallelism over TPU meshes.
"""

__version__ = "0.1.0"

from .config import (
    EngineConfig,
    ModelConfig,
    QuantConfig,
    QuantType,
    adapt_hf_config,
    load_model_config,
)

__all__ = [
    "__version__",
    "EngineConfig",
    "ModelConfig",
    "QuantConfig",
    "QuantType",
    "adapt_hf_config",
    "load_model_config",
]
