"""GWAS layer — batched per-SNP association testing.

Replaces gwas.{h,cpp}, gwasmp.cpp, igwas.{h,cpp}, mpresiduals.{h,cpp}.
The reference's serial per-SNP loop and grouped-communicator task
parallelism (gwas.cpp:480-687) become batched einsums over the SNP axis
and vmapped per-SNP ML fits — on TPU the MXU replaces process groups.
"""

from dissect_tpu.gwas.ols import ols_gwas
from dissect_tpu.gwas.mlm import mlm_gwas_fixed_v, mlm_gwas_ml_refit
