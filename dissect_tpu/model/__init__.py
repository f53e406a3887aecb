"""Model layer: kernels (GRM & friends) and the symbolic covariance matrix.

Replaces the reference's L3 statistical-model layer (kernel.{h,cpp},
covariancematrix.{h,cpp}, blockmatrix.{h,cpp}).  The BlockMatrix
"matrix of diagonal blocks" specialization becomes the (n, T, T)
batched-block representation in covariance.py — vmapped small solves
instead of a distributed block container.
"""

from dissect_tpu.model.kernels import Kernel, KernelType, grm_from_plink
from dissect_tpu.model.covariance import (
    CovarianceModel,
    Element,
    Variance,
    ParameterType,
    EffectType,
    VarianceTransform,
)
