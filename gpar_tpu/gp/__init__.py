from .core import (  # noqa: F401
    FDD,
    GP,
    DenseObs,
    Obs,
    PosteriorGP,
    PseudoObs,
    SparseObs,
    SparsePosteriorGP,
    TitsiasObs,
    condition,
)
