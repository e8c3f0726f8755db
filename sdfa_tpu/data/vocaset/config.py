"""VOCASET conventions: FLAME template + speaker alias tables.

Reference: /root/reference/speech_anime/datasets/vocaset/config.py.
The FLAME sample template ships with the reference checkout (read-only
asset); speaker→FaceTalk alias table is the public VOCA split.
"""

import os

import numpy as np

REFERENCE_ASSETS = "/root/reference/speech_anime/datasets/vocaset"
TEMPLATE_PLY = os.path.join(REFERENCE_ASSETS, "template", "FLAME_sample.ply")
TEMPLATES_DIR = os.path.join(REFERENCE_ASSETS, "templates")

N_VERTS = 5023
N_TRIS = 9976
LIPS_UPPER_VERT = 3531
LIPS_LOWER_VERT = 3509

SPEAKER_ALIAS = dict(
    m0="FaceTalk_170728_03272_TA",
    f0="FaceTalk_170904_00128_TA",
    m1="FaceTalk_170725_00137_TA",
    m2="FaceTalk_170915_00223_TA",
    f1="FaceTalk_170811_03274_TA",
    m3="FaceTalk_170913_03279_TA",
    f2="FaceTalk_170904_03276_TA",
    f3="FaceTalk_170912_03278_TA",
    f4="FaceTalk_170811_03275_TA",
    m4="FaceTalk_170908_03277_TA",
    m5="FaceTalk_170809_00138_TA",
    f5="FaceTalk_170731_00024_TA",
)
TRAIN_SPEAKERS = ["m0", "f0", "m1", "m2", "f1", "m3", "f2", "f3"]
VALID_SPEAKERS = ["f4", "m4"]
TEST_SPEAKERS = ["m5", "f5"]


def non_face_masks():
    """(non_face_verts, non_face_tris) from the reference mask asset."""
    import sys

    sys.path.insert(0, os.path.join(REFERENCE_ASSETS, "mask"))
    import non_face

    return np.asarray(non_face.non_face_verts), np.asarray(non_face.non_face_tris)
