from ptyrad_tpu.params.schema import (
    ConstraintParams,
    HypertuneParams,
    InitParams,
    LossParams,
    ModelParams,
    PtyRADParams,
    ReconParams,
)

__all__ = [
    "PtyRADParams",
    "InitParams",
    "ModelParams",
    "LossParams",
    "ConstraintParams",
    "ReconParams",
    "HypertuneParams",
]
