from .hf_loader import iter_safetensors, load_hf_state, map_hf_params

__all__ = ["iter_safetensors", "load_hf_state", "map_hf_params"]
