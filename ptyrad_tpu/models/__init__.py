from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams, make_model
from ptyrad_tpu.models.forward import (
    compute_propagators,
    forward,
    get_measurements,
    get_obj_patches,
    get_probes,
    multislice_dp,
    propagated_probe,
)

__all__ = [
    "PtychoParams",
    "Buffers",
    "Geometry",
    "make_model",
    "forward",
    "multislice_dp",
    "compute_propagators",
    "get_obj_patches",
    "get_probes",
    "get_measurements",
    "propagated_probe",
]
