"""Regional heritability REML.

Parity: SingleREML::computeRegional (singlereml.cpp:230-360): for every
SNP region fit a 2-kernel model — the "Regional-GRM" built from the
region's SNPs and the "Global-GRM" = full GRM minus regional (via the
denormalize/add/renormalize kernel algebra, kernel.cpp:1705) — with
initial-weight split proportional to the region's SNP share
(singlereml.cpp:322-328), testing both kernels via reduced-model LRTs.
SingleREML::computeMultipleGroups fits all regional GRMs jointly
instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from dissect_tpu.io.bed import PlinkData
from dissect_tpu.io.covariate import Covariate
from dissect_tpu.io.phenotype import Phenotype
from dissect_tpu.model.kernels import Kernel, grm_from_plink
from dissect_tpu.reml.engine import REMLOptions
from dissect_tpu.reml.single import SingleREML
from dissect_tpu.runtime.log import get_logger


def compute_regional(
    data: PlinkData,
    grouping: Dict[str, List[str]],
    phenotype: Phenotype,
    covariate: Optional[Covariate] = None,
    options: Optional[REMLOptions] = None,
    grm: Optional[Kernel] = None,
    test_global: bool = True,
) -> Dict[str, dict]:
    """Per-region 2-kernel REML with LRTs.  Returns region -> results."""
    options = options or REMLOptions()
    log = get_logger()
    if grm is None:
        grm = grm_from_plink(data)
    results: Dict[str, dict] = {}
    n_total_snps = data.n_snps
    for group, snps in grouping.items():
        log.message(f"\nAnalysing region {group}...")
        regional_data = data.filter(keep_snps=snps)
        regional = grm_from_plink(regional_data, name="Regional-GRM")
        global_ = grm.add(regional, subtract=True)
        global_.name = "Global-GRM"
        proportion = len(snps) / n_total_snps
        weights = [1.0 - proportion, proportion]

        driver = SingleREML([global_, regional], phenotype, covariate, options)
        to_test = ["Regional-GRM"] + (["Global-GRM"] if test_global else [])
        full, lrts = driver.compute_with_reduced_models(
            elements_to_test=to_test, weights=weights
        )
        results[group] = {
            "full": full,
            "lrts": lrts,
            "n_snps": len(snps),
            "proportion": proportion,
        }
    return results


def compute_regional_multi(
    data: PlinkData,
    grouping: Dict[str, List[str]],
    phenotypes,
    covariates=None,
    options: Optional[REMLOptions] = None,
    grm: Optional[Kernel] = None,
    use_correlations: bool = False,
):
    """Multi-trait regional REML (MultiREML::computeRegional,
    multireml.cpp:139+): per region, the Global/Regional kernel pair is
    fitted jointly across traits with cross-trait covariances."""
    from dissect_tpu.reml.multi import MultiREML

    options = options or REMLOptions()
    log = get_logger()
    if grm is None:
        grm = grm_from_plink(data)
    results: Dict[str, dict] = {}
    for group, snps in grouping.items():
        log.message(f"\nAnalysing region {group} (multi-trait)...")
        regional_data = data.filter(keep_snps=snps)
        regional = grm_from_plink(regional_data, name="Regional-GRM")
        global_ = grm.add(regional, subtract=True)
        global_.name = "Global-GRM"
        proportion = len(snps) / data.n_snps
        driver = MultiREML(
            [global_, regional],
            phenotypes,
            covariates,
            options,
            use_correlations=use_correlations,
        )
        out = driver.compute(weights=[1.0 - proportion, proportion])
        results[group] = {
            "full": out,
            "n_snps": len(snps),
            "proportion": proportion,
        }
    return results


def compute_multiple_groups(
    data: PlinkData,
    grouping: Dict[str, List[str]],
    phenotype: Phenotype,
    covariate: Optional[Covariate] = None,
    options: Optional[REMLOptions] = None,
):
    """All regional GRMs fitted jointly (SingleREML::computeMultipleGroups)."""
    options = options or REMLOptions()
    kernels = []
    for group, snps in grouping.items():
        regional_data = data.filter(keep_snps=snps)
        kernels.append(grm_from_plink(regional_data, name=f"GRM-{group}"))
    driver = SingleREML(kernels, phenotype, covariate, options)
    return driver.compute_with_reduced_models(
        elements_to_test=[k.name for k in kernels]
    )
