"""spfx — TPU-native sparse supernodal factorization + recommender engine.

A ground-up JAX/XLA/Pallas re-design of the SparseFrame CUDA library's
capabilities (supernodal sparse Cholesky and no-pivot LU direct solvers) plus
the ALS/iALS recommender layer built on the same batched dense-block kernels.

Public API:
    spfx.cholesky(A)          -> CholeskyFactor (solve/L_sparse/logdet)
    spfx.Cholesky(A)          -> reusable symbolic+plan context
    spfx.lu(A) / spfx.LU(A)   -> unpivoted sparse LU
    spfx.analyze(A)           -> Symbolic (ordering/etree/supernodes/levels)
    spfx.Config               -> runtime configuration
    spfx.validate(factor)     -> (x, scaled_residual)
    spfx.recsys.ALSModel      -> sharded ALS/iALS recommender
"""

from spfx.utils.config import Config, DEFAULT
from spfx.symbolic.analyze import analyze, Symbolic
from spfx.chol.factorize import cholesky, Cholesky, CholeskyFactor
from spfx.lu.factorize import lu, LU, LUFactor
from spfx.validate import validate, scaled_residual, synth_rhs

__all__ = [
    "Config", "DEFAULT", "analyze", "Symbolic",
    "cholesky", "Cholesky", "CholeskyFactor",
    "lu", "LU", "LUFactor",
    "validate", "scaled_residual", "synth_rhs",
]

__version__ = "0.1.0"
