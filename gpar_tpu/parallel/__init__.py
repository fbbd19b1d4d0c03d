"""Multi-chip execution: row-sharded sparse statistics (``sharded``),
the row-sharded exact dense path (``dense``), and mesh construction.

The reference is single-process (SURVEY.md §2.4); this package is the
TPU-native scale-out design — ``shard_map`` over a named 1-D mesh with
XLA collectives, the same code running single-chip, on a pod slice, or
on the virtual CPU mesh the test suite uses.
"""

from .dense import sharded_dense_factors, sharded_dense_logpdf
from .sharded import (
    make_mesh,
    pad_rows,
    sharded_sample_batch,
    sharded_titsias_elbo,
    sharded_titsias_factors,
    titsias_psum_body,
)

__all__ = [
    "make_mesh",
    "pad_rows",
    "sharded_dense_factors",
    "sharded_dense_logpdf",
    "sharded_sample_batch",
    "sharded_titsias_elbo",
    "sharded_titsias_factors",
    "titsias_psum_body",
]
