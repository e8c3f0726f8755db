from . import losses, sdfa
from .losses import ScalerState, dynamic_scale, eloss, mloss, ploss
from .sdfa import PcaInversion, SpeakerEmbedding, SpeechDrivenAnimation, build_model

__all__ = [
    "losses",
    "sdfa",
    "ScalerState",
    "dynamic_scale",
    "eloss",
    "mloss",
    "ploss",
    "PcaInversion",
    "SpeakerEmbedding",
    "SpeechDrivenAnimation",
    "build_model",
]
