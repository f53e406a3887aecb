"""Linear algebra layer — the TPU replacement of Matrix/ScaLAPACK (L1).

The reference's 2D block-cyclic `Matrix` (matrix.{h,cpp}, ~6k LoC of
BLACS/ScaLAPACK plumbing) collapses into jax.Arrays with NamedShardings;
what remains to implement is the numerics ScaLAPACK provided:

  syrk.py    Z^T Z accumulation over SNP chunks (pdsyrk_, matrix.cpp:2682)
  spd.py     SPD inverse + log-det via Cholesky, LU fallback
             (pdpotrf_/pdpotri_/pdgetrf_, matrix.cpp:3080-3300)
  eigen.py   symmetric eigensolver (pdsyev_, matrix.cpp:3327-3380)
  dc_eigen.py distributed full-spectrum eigensolver (QDWH sign-function
             divide-and-conquer over the mesh) for beyond-one-device N
  qr.py      QR + dependent-column detection (pdgeqrf_, matrix.cpp:3501+)
  traces.py  trace identities tr(A B), diag(A B A^T)
             (matrix.cpp:3835-3960) as einsums
"""

from dissect_tpu.linalg.syrk import syrk, grm_accumulator
from dissect_tpu.linalg.spd import (
    spd_inverse_logdet,
    fallback_inverse_logdet,
    lu_inverse_logdet,
    cholesky_logdet,
)
from dissect_tpu.linalg.eigen import eigh_full, eigh_topk
from dissect_tpu.linalg.dc_eigen import distributed_eigh, matrix_sign
from dissect_tpu.linalg.traces import trace_of_product, diag_of_abat
from dissect_tpu.linalg.qr import dependent_columns
