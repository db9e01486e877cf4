from diner_tpu.core.types import SceneEncoding, RenderConfig

__all__ = ["SceneEncoding", "RenderConfig"]
