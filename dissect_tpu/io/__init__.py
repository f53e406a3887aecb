"""IO layer: genomic data ingestion and artifact formats.

Replaces the reference's L2 domain-data layer (genotype.{h,cpp},
phenotype.{h,cpp}, covariate.{h,cpp}, labeledmatrix.{h,cpp}) with
host-side numpy loaders that feed device arrays:

  bed.py            PLINK .bed/.bim/.fam (reader, writer, 2-bit decode,
                    per-SNP stats, GCTA standardization)
  phenotype.py      FID IID phenotype column files
  covariate.py      discrete + quantitative covariates -> design matrix
  labeled_matrix.py matrix + row/col string labels (.rowids/.colids/.dat)
  grm_io.py         DISSECT-compatible .grm.{dat,ids,snps} binary format
  ids.py            ID-set algebra (intersection / template ordering)
  bgen.py           BGEN dosage loader (layout 2)
"""

from dissect_tpu.io.bed import PlinkData, read_plink, write_plink, SnpStats
from dissect_tpu.io.phenotype import Phenotype, read_phenotype
from dissect_tpu.io.covariate import Covariate, read_covariates
from dissect_tpu.io.ids import intersection_keeping_order, order_as_template
