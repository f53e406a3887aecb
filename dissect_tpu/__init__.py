"""dissect_tpu — a TPU-native genomic mixed-model engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DISSECT
(the MPI/ScaLAPACK C++ reference): GRM construction, AI-REML variance
components (single/bivariate/multivariate), mixed-model GWAS, PCA,
BLUP/BLUE, phenotype simulation and polygenic prediction.

Architecture (TPU-first, not a port):
  - the reference's Communicator/Matrix/BlockMatrix layers (MPI + BLACS +
    ScaLAPACK, ~7.5k LoC) collapse into a `jax.sharding.Mesh` +
    `NamedSharding` + `jit`: XLA SPMD inserts all collectives.
  - hot kernels (genotype standardization, chunked Z^T Z accumulation)
    are Pallas TPU kernels; everything else is jitted XLA.
  - the statistical layer is pure-functional pytree code.

Layout:
  runtime/  mesh construction, dtype policy, logging, timers, options (CLI)
  io/       PLINK bed/bim/fam + BGEN loaders, phenotypes, covariates,
            labeled matrices, DISSECT .grm.* binary format
  linalg/   sharded syrk, SPD solve/inverse + log-det, eigensolver,
            QR/dependent columns, trace identities
  model/    Kernel (GRM & friends) and the symbolic CovarianceMatrix
  reml/     AI-REML engine + single/multi-trait drivers, BLUE/BLUP
  glm/      logistic regression (GLM) and MCMC logistic mixed model (GLMM)
  gwas/     batched single-SNP/grouped/recursive GWAS, mpresiduals/mpgwas,
            igwas
  pca/      distributed PCA of kernels
  analysis/ dispatcher + simulate/predict/effects workflows (CLI surface)
"""

__version__ = "0.1.0"
