"""Multiprocess prefetch loader tests (fork workers; numpy-only inside)."""

import numpy as np
import pytest

from sdfa_tpu.data import DatasetSlidingWindow
from sdfa_tpu.data.prefetch import PrefetchLoader
from sdfa_tpu.tools import configure

from test_data_pipeline import hp, synth_root  # fixtures


class TestPrefetch:
    def test_batches_arrive_and_match_schema(self, hp):
        ds = DatasetSlidingWindow(hp, training=False)
        loader = PrefetchLoader(ds, batch_size=4, num_workers=2, shuffle=False)
        batches = []
        for b in loader:
            batches.append(b)
            if len(batches) >= 3:
                break
        assert len(batches) == 3
        for b in batches:
            assert b["audio_feat"].shape == (8, 64, 128, 3)
            assert b["dgrad_3d_scale"].shape == (8, 1, 9976, 6)

    def test_len(self, hp):
        ds = DatasetSlidingWindow(hp, training=False)
        loader = PrefetchLoader(ds, batch_size=7, num_workers=1)
        assert len(loader) == len(ds) // 7


class _SuicidalDataset:
    """Worker calls __getitem__ → os._exit: simulates a silently-dying fork."""
    training = False
    _rng = None

    def __len__(self):
        return 8

    def __getitem__(self, i):
        import os
        os._exit(1)

    @staticmethod
    def collate(items):
        return items


class _FailingDataset:
    """__getitem__ raises — the original traceback must reach the caller."""
    training = False
    _rng = None

    def __len__(self):
        return 8

    def __getitem__(self, i):
        raise ValueError("synthetic failure inside __getitem__ marker-12345")

    @staticmethod
    def collate(items):
        return items


class TestWorkerFailure:
    def test_worker_traceback_text_surfaces(self):
        loader = PrefetchLoader(_FailingDataset(), batch_size=2, num_workers=1)
        with pytest.raises(RuntimeError) as ei:
            for _ in loader:
                pass
        msg = str(ei.value)
        # the remote traceback — not just the exception repr — must be there
        assert "marker-12345" in msg
        assert "worker traceback" in msg
        assert "__getitem__" in msg  # the real failure site


class TestWorkerDeath:
    def test_dead_workers_raise_instead_of_hanging(self):
        import time

        loader = PrefetchLoader(_SuicidalDataset(), batch_size=2, num_workers=2)
        t0 = time.time()
        with pytest.raises(RuntimeError, match="prefetch workers died"):
            for _ in loader:
                pass
        assert time.time() - t0 < 60  # liveness poll, not a hang
