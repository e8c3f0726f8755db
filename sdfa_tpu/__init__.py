"""sdfa_tpu — a TPU-native speech-driven facial animation framework.

A from-scratch JAX/XLA re-design with the capabilities of the reference
PyTorch/CUDA implementation of "Speech-Driven Facial Animation with Spectral
Gathering and Temporal Attention" (chaiyujin/sdfa-2019).
"""

from . import audio, mesh, utils
from .utils import ArgumentParser, ConfigDict, log

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy subpackage access (keeps `import sdfa_tpu` light — the heavy
    modules pull in flax/optax)."""
    import importlib

    lazy = {
        "compat", "data", "models", "nn", "ops", "parallel", "profiling",
        "task", "tools", "train", "viewer", "visualize", "native", "api",
    }
    if name in lazy:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'sdfa_tpu' has no attribute '{name}'")


__all__ = [
    "audio", "mesh", "utils", "ArgumentParser", "ConfigDict", "log",
    "api", "compat", "data", "models", "nn", "ops", "parallel", "profiling",
    "task", "tools", "train", "viewer", "visualize", "native", "__version__",
]
