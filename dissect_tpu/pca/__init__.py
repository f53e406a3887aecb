"""PCA of kernels (GRM eigenstructure)."""

from dissect_tpu.pca.pca import PCA, compute_pca
