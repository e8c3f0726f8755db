"""Matmul precision policy for the NN compute path.

The DSP frontend and the deformation solver always run at HIGHEST (they are
the numerical parity backbone).  The learned model's matmuls default to
HIGHEST too, but can be relaxed via SDFA_MATMUL_PRECISION=high|default for
throughput — vertex-level parity stays well under the 1e-4 budget at "high"
(3-pass bf16 ≈ 2e-6 relative error).
"""

import os

import jax

_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

MODEL_PREC = _NAMES[os.environ.get("SDFA_MATMUL_PRECISION", "highest").lower()]

# ops (solver/dgrad/frontend) precision — separate knob, HIGHEST default
OPS_PREC = _NAMES[os.environ.get("SDFA_OPS_PRECISION", "highest").lower()]

# conv-only override (experiment knob): the conv encoder prefix is a big
# slice of the frontend stage's MXU time; SDFA_CONV_PRECISION=default
# lowers just the convolutions to 1-pass bf16. Only shippable if the
# bench realism line's f64-oracle error stays < 1e-4 — activations run
# ~±1 post-norm, so bf16's ~2e-3 relative error lands directly on the
# learned features (unlike the solve's delta trick there is no exact
# reference to ride on). Unset → follows SDFA_MATMUL_PRECISION.
CONV_PREC = (_NAMES[os.environ["SDFA_CONV_PRECISION"].lower()]
             if os.environ.get("SDFA_CONV_PRECISION") else MODEL_PREC)
