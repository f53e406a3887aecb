"""Per-SNP BLUP effects from a fitted REML model.

Parity: REML::computeSNPsBLUP (reml.cpp:3098-3356): for sub-covariance
(GRM) `name` with fitted variance s2, the SNP effects are

  blup_s = s2 * (Z_s . Py) * n_total / (n_nonmissing_s * n_grm_snps)

over the standardized genotype rows Z_s used to build the GRM, written
as `.<name>.blup.snps` with columns SNP ALLELE BLUP STDEV MEAN NBLUP
(reml.cpp:3330-3346).  These files feed polygenic prediction
(predictphenotype loadREMLEffect).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from dissect_tpu.io.bed import PlinkData
from dissect_tpu.io.ids import order_as_template


def compute_snp_blup(
    data: PlinkData,
    individual_keys: List[str],
    py: np.ndarray,
    genetic_variance: float,
    grm_snp_names: Optional[List[str]] = None,
) -> dict:
    """SNP BLUPs for a single-trait fit.

    data: the genotype fileset used for the GRM; individual_keys / py:
    the analysis individuals (GRM order) and the fitted P y vector;
    genetic_variance: the sub-covariance's fitted variance.
    """
    if grm_snp_names is None:
        grm_snp_names = data.snp_names
    keep = order_as_template(data.snp_names, grm_snp_names)
    sub = data.filter(keep_snps=keep, keep_individuals=individual_keys)
    stats = sub.stats()
    dosage = sub.dosages()
    observed = (dosage >= 0).astype(np.float64)
    z = observed * (dosage - stats.mean[:, None]) / stats.std[:, None]
    n_total = len(individual_keys)
    n_grm_snps = len(grm_snp_names)
    raw = z @ np.asarray(py, dtype=np.float64)  # (M,)
    n_nonmissing = observed.sum(axis=1)
    blup = (
        genetic_variance
        * raw
        * n_total
        / (np.maximum(n_nonmissing, 1.0) * n_grm_snps)
    )
    return {
        "snp_names": sub.snp_names,
        "alleles": [s.allele2 for s in sub.snps],
        "blup": blup,
        "std": stats.std,
        "mean": stats.mean,
    }


def write_snp_blup(prefix: str, name: str, result: dict, pheno_suffix: str = ""):
    """Write .<name>.blup.snps (reml.cpp:3330-3346)."""
    fname = f"{prefix}.{name.replace(' ', '_')}{pheno_suffix}.blup.snps"
    with open(fname, "w") as fh:
        fh.write("SNP ALLELE BLUP STDEV MEAN NBLUP\n")
        for i, snp in enumerate(result["snp_names"]):
            blup = result["blup"][i]
            std = result["std"][i]
            fh.write(
                f"{snp} {result['alleles'][i]} {blup:.14g} {std:.14g} "
                f"{result['mean'][i]:.14g} {blup / std:.14g}\n"
            )
    return fname
