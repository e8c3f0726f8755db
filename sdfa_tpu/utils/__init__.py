from . import argparser, bilateral, filesystem, log, npext, stream, visualizer
from .argparser import ArgumentParser
from .bilateral import BilateralFilter1D
from .config import ConfigDict

__all__ = [
    "ArgumentParser",
    "BilateralFilter1D",
    "ConfigDict",
    "argparser",
    "bilateral",
    "filesystem",
    "log",
    "npext",
    "stream",
    "visualizer",
]
