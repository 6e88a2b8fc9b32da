"""zhilight_tpu — a TPU-native LLM serving framework.

Brand-new JAX/XLA/Pallas implementation with the capability set of the
zhihu/ZhiLight CUDA engine: continuous-batching OpenAI-compatible serving,
paged KV cache with prefix reuse, chunked prefill, LLaMA/Qwen/Mixtral/
DeepSeek-V2/V3 model families (MoE + MLA), weight quantization
(INT8/GPTQ/AWQ/FP8), and tensor/expert parallelism over TPU meshes.
"""

__version__ = "0.1.0"

import os as _os

# Environments that preload jax before user code (e.g. via sitecustomize)
# freeze config defaults before scripts can set env vars; re-apply the ones
# this package's entry points rely on so JAX_COMPILATION_CACHE_DIR /
# JAX_PLATFORMS set in the launching shell or script actually take effect.
if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backends already initialized; too late to switch

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
