from . import config, preload

__all__ = ["config", "preload"]
