from .base import DecodeMeta, PrefillMeta

__all__ = ["DecodeMeta", "PrefillMeta"]
