from ptyrad_tpu.physics.constants import get_em_constants, infer_dx
from ptyrad_tpu.physics.probe import (
    hermite_like_basis,
    make_fzp_probe,
    make_mixed_probe,
    make_stem_probe,
)
from ptyrad_tpu.physics.propagator import near_field_evolution

__all__ = [
    "get_em_constants",
    "infer_dx",
    "make_stem_probe",
    "make_fzp_probe",
    "make_mixed_probe",
    "hermite_like_basis",
    "near_field_evolution",
]
