"""sdfa_tpu — a TPU-native speech-driven facial animation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch/CUDA implementation of "Speech-Driven Facial Animation
with Spectral Gathering and Temporal Attention" (chaiyujin/sdfa-2019).
"""

from . import audio, mesh, utils
from .utils import ArgumentParser, ConfigDict, log

__version__ = "0.1.0"

__all__ = ["audio", "mesh", "utils", "ArgumentParser", "ConfigDict", "log", "__version__"]
