from . import csvio, features_host, prefetch, synthetic
from .sliding_window import DatasetSlidingWindow
from .speech_anime import SpeechAnimeDataset

__all__ = [
    "csvio",
    "prefetch",
    "features_host",
    "synthetic",
    "DatasetSlidingWindow",
    "SpeechAnimeDataset",
]
