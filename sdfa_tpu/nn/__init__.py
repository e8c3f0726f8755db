from . import attention, functions, layers, recurrent, spec
from .spec import LayerStack, freeze_specs, parse_specs

__all__ = [
    "attention",
    "functions",
    "layers",
    "recurrent",
    "spec",
    "LayerStack",
    "freeze_specs",
    "parse_specs",
]
