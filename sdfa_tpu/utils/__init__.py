from . import argparser, filesystem, log, stream
from .argparser import ArgumentParser
from .config import ConfigDict

__all__ = [
    "ArgumentParser",
    "ConfigDict",
    "argparser",
    "filesystem",
    "log",
    "stream",
]
