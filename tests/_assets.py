"""Shared test assets: random PCA matrices at the shipped dims."""

import os

import numpy as np


def ensure_pca_assets(root: str = "/tmp/sdfa_test_assets") -> str:
    os.makedirs(root + "/pca", exist_ok=True)
    rng = np.random.default_rng(0)
    specs = {
        "scale_compT.npy": (59856, 85), "scale_means.npy": (59856,),
        "rotat_compT.npy": (29928, 180), "rotat_means.npy": (29928,),
        # offsets family (configs/model/offsets.py)
        "compT.npy": (15069, 59), "means.npy": (15069,),
    }
    for name, shape in specs.items():
        path = os.path.join(root, "pca", name)
        if not os.path.exists(path):
            np.save(path, rng.normal(0, 0.01, shape).astype(np.float32))
    return root
