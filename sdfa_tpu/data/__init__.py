from . import csvio, features_host, synthetic
from .sliding_window import DatasetSlidingWindow
from .speech_anime import SpeechAnimeDataset

__all__ = [
    "csvio",
    "features_host",
    "synthetic",
    "DatasetSlidingWindow",
    "SpeechAnimeDataset",
]
