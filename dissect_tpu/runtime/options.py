"""CLI options — DISSECT-compatible flag surface.

Parity: options.{h,cpp} — the AnalysisToPerform enum (options.h:34-58)
and the ~150 flags (options.cpp:278-1158), with the same names, typed
getters and Range validation (range.h:27-57), incompatibility checks
and option echo (options.cpp:1229-1664).  Flags implemented by analyses
that are still landing raise a clear NotImplementedError instead of
silently parsing.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional

from dissect_tpu.reml.engine import REMLOptions


class OptionsError(ValueError):
    pass


def _ranged(type_, lo=None, hi=None):
    """Typed getter with Range bounds (range.h:27-57)."""

    def parse(text):
        v = type_(text)
        if lo is not None and v < lo:
            raise argparse.ArgumentTypeError(f"value {v} below minimum {lo}")
        if hi is not None and v > hi:
            raise argparse.ArgumentTypeError(f"value {v} above maximum {hi}")
        return v

    return parse


ANALYSES = [
    # (flag, dest, help) — mirrors AnalysisToPerform (options.h:34-58)
    ("--make-grm", "makeGRM", "compute the GRM from genotypes"),
    ("--reml", "REML", "single-trait AI-REML variance components"),
    ("--bivar-reml", "bivarREML", "bivariate REML"),
    ("--multi-reml", "multiREML", "multivariate REML"),
    ("--gwas", "GWAS", "per-SNP association (mixed model when a GRM is given)"),
    ("--rgwas", "recursiveGWAS", "recursive grouped GWAS"),
    ("--igwas", "iGWAS", "inverse GWAS (SNP as outcome)"),
    ("--mpgwas", "multiplePhenotypeGWAS", "multi-phenotype residual GWAS"),
    ("--mpresiduals", "multiplePhenotypeResiduals", "precompute mpgwas residuals"),
    ("--pca", "PCA", "principal components of the GRM"),
    ("--simulate", "simulate", "simulate phenotypes from causal effects"),
    ("--predict", "predict", "polygenic phenotype prediction"),
    ("--effects", "groupEffects", "group-effects analysis"),
    ("--glmm", "GLMM", "logistic mixed model (experimental)"),
    ("--snp-stats", "snpStats", "per-SNP allele statistics"),
    ("--accuracy-by-snp", "accuracyBySNP", "prediction accuracy vs SNP removal"),
    ("--filter-matrix", "filterMatrix", "filter a labeled matrix by row/col label files"),
    ("--add-grms", "addGRMs", "sum the GRMs in --grm-list into one"),
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dissect_tpu",
        description="TPU-native genomic mixed-model engine "
        "(capabilities of DISSECT, rebuilt on JAX/XLA/Pallas)",
    )
    g = p.add_argument_group("analysis")
    for flag, dest, help_ in ANALYSES:
        g.add_argument(flag, dest=dest, action="store_true", help=help_)

    d = p.add_argument_group("data")
    d.add_argument("--bfile", help="PLINK .bed/.bim/.fam prefix")
    d.add_argument("--bfile-list", help="file listing PLINK prefixes")
    d.add_argument("--bgen", help="BGEN genotype file")
    d.add_argument("--grm", help="GRM prefix (.grm.dat/ids/snps)")
    d.add_argument("--grm-list", help="file listing GRM prefixes")
    d.add_argument("--pheno", help="phenotype file (FID IID pheno...)")
    d.add_argument("--pheno-col", type=_ranged(int, 1), default=1,
                   help="phenotype column (1-based)")
    d.add_argument("--pheno-cols", help="comma-separated phenotype columns "
                   "(bivar/multi/mp analyses)")
    d.add_argument("--covar", help="discrete covariates file")
    d.add_argument("--qcovar", help="quantitative covariates file")
    d.add_argument("--covars", help="per-trait discrete covariate files, comma-separated")
    d.add_argument("--qcovars", help="per-trait quantitative covariate files, comma-separated")
    d.add_argument("--extract", help="file of SNP ids to keep")
    d.add_argument("--keep", help="file of individuals (FID IID) to keep")
    d.add_argument("--out", default="dissect_tpu", help="output prefix")

    grm = p.add_argument_group("grm")
    grm.add_argument("--grm-cutoff", type=float, default=None,
                     help="prune one of each pair with relatedness above cutoff")
    grm.add_argument("--diagonalize", action="store_true",
                     help="store/use the eigendecomposed GRM")
    grm.add_argument("--grm-flat-norm", action="store_true",
                     help="normalize by total SNP count, not per-pair counts")
    grm.add_argument("--grm-epi", action="store_true", help="epistatic GRM (K.*K)")
    grm.add_argument("--min-overlap-snps", type=float, default=0.1)
    grm.add_argument("--keep-zerostd-snps", action="store_true",
                      help="silently drop monomorphic SNPs instead of erroring")
    grm.add_argument("--gcta-grms-gz", help="GCTA .grm.id/.grm.gz prefix")

    reml = p.add_argument_group("reml")
    reml.add_argument("--reml-maxit", type=int, default=40)
    reml.add_argument("--variance-threshold", type=_ranged(float, 0.0, 0.1),
                      default=1e-5)
    reml.add_argument("--gradient-threshold", type=_ranged(float, 0.0), default=1e-2)
    reml.add_argument("--ai-switch-threshold", type=_ranged(float, 0.0, 1.0),
                      default=1e-3)
    reml.add_argument("--ai-em-switch", action="store_true")
    reml.add_argument("--no-first-em", action="store_true")
    reml.add_argument("--reml-qstep-scale", type=_ranged(float, 0.0, 1.0), default=0.3)
    reml.add_argument("--initial-h2", type=_ranged(float, 0.0, 1.0), default=0.5)
    reml.add_argument("--use-log-logistic", action="store_true")
    reml.add_argument("--use-correlations", action="store_true")
    reml.add_argument("--use-ml", action="store_true")
    reml.add_argument("--max-correlation", type=_ranged(float, 0.0), default=1.0)
    reml.add_argument("--variance-constrain", type=float, default=1e-6)
    reml.add_argument("--gcta-mode", action="store_true")
    reml.add_argument("--no-environment-cov", action="store_true")
    reml.add_argument("--blue", action="store_true", help="write BLUE fixed effects")
    reml.add_argument("--indiv-blup", action="store_true", help="write individual BLUPs")
    reml.add_argument("--snp-blup", action="store_true", help="write per-SNP BLUP effects")
    reml.add_argument("--reml-method-em", action="store_true")
    reml.add_argument("--weights", help="kernel weights file")
    reml.add_argument("--random-effects", help="FID IID category file adding a "
                      "discrete random-effect kernel (--random-effects)")
    reml.add_argument("--random-effects-cols", type=int, default=1)
    reml.add_argument("--multirandom-effects", help="FID IID categories file "
                      "adding a multi-category random-effect kernel")
    reml.add_argument("--sqrt-exp-coord-files", help="coordinate file adding a "
                      "squared-exponential kernel")
    reml.add_argument("--gxe", action="store_true",
                      help="add a GRM x environment interaction kernel "
                      "(requires --random-effects)")
    reml.add_argument("--initial-variances", help="seed variances from a prior "
                      "fit's 'name value' file")
    reml.add_argument("--checkpoint", help="REML checkpoint file for "
                      "preemption-safe resume")
    reml.add_argument("--subsample-replicates", type=int, default=0,
                      help="pre-fit on random subsamples to seed initial "
                      "variances (options.h:124-127)")
    reml.add_argument("--subsample-proportion", type=float, default=0.2)
    reml.add_argument("--fix-correlation", type=float, default=None,
                      help="refit with the genetic correlation fixed and LRT")
    reml.add_argument("--param-init-fac", type=float, default=1.0,
                      help="initial-alpha factor for squared-exponential "
                      "kernels (expKernelParameterInitialFactor)")
    reml.add_argument("--steps-to-unfix", type=int, default=8,
                      help="Newton steps before kernel parameters unfix "
                      "(remlStepsToUnfixExpKernelParameter)")
    reml.add_argument("--no-single-precision", action="store_true",
                      help="accepted for compatibility; the engine already "
                      "finishes fits with float64 refinement")
    reml.add_argument("--skip-test-reduced-models", action="store_true")
    reml.add_argument("--indirect-effects-couples",
                      help="4-column couples file (FID1 IID1 FID2 IID2) adding "
                      "partner-resorted GRMs for indirect genetic effects")

    gwas = p.add_argument_group("gwas")
    gwas.add_argument("--igwas-covar", help="discrete covariates tested by inverse GWAS")
    gwas.add_argument("--igwas-qcovar", help="quantitative covariates tested by inverse GWAS")
    gwas.add_argument("--groups", help="SNP group file: regional REML with "
                      "--reml, grouped GWAS with --gwas")
    gwas.add_argument("--region-size", type=int, default=None,
                      help="region size in kb; triggers regional analysis "
                      "(options.cpp:979-984)")
    gwas.add_argument("--region-overlap", type=int, default=0,
                      help="region overlap in kb (options.cpp:987-992)")
    gwas.add_argument("--min-snps-region", type=int, default=1)
    gwas.add_argument("--rgwas-group-size", type=int, default=100)
    gwas.add_argument("--parallel-gwas", action="store_true",
                      help="accepted for compatibility; per-SNP tests are "
                      "always batched on the accelerator")
    gwas.add_argument("--nonparallel-gwas", action="store_true",
                      help="accepted for compatibility (see --parallel-gwas)")
    gwas.add_argument("--group-all", action="store_true",
                      help="grouped GWAS with one group of all SNPs")
    gwas.add_argument("--group-effects", action="store_true",
                      help="save per-individual group effects (LabeledMatrix)")
    gwas.add_argument("--snp-corr-threshold", type=float, default=0.99)
    gwas.add_argument("--gwas-use-null-variances", action="store_true",
                      help="fast path: fix variances at the null model fit "
                      "(EMMAX-style) instead of per-SNP ML refits")
    gwas.add_argument("--significance-threshold", type=float, default=5e-8)

    pca = p.add_argument_group("pca")
    pca.add_argument("--num-eval", type=_ranged(int, 1), default=20)

    sim = p.add_argument_group("simulate/predict")
    sim.add_argument("--effect-sizes", help="causal SNP effects file")
    sim.add_argument("--simu-h2", type=_ranged(float, 0.0, 1.0), default=0.5)
    sim.add_argument("--simu-binary", action="store_true")
    sim.add_argument("--simu-quantitative", action="store_true")
    sim.add_argument("--prevalence", type=_ranged(float, 0.0, 1.0), default=0.1)
    sim.add_argument("--snp-effects", help="SNP effect file for prediction")
    sim.add_argument("--random-seed", type=int, default=1)

    lm = p.add_argument_group("labeled-matrix")
    lm.add_argument("--imatrix", help="input labeled-matrix prefix for --filter-matrix")
    lm.add_argument("--row-labels", help="file of row labels to keep")
    lm.add_argument("--col-labels", help="file of column labels to keep")

    misc = p.add_argument_group("misc")
    misc.add_argument("--verbose", action="store_true")
    misc.add_argument("--zout", action="store_true", help="gzip result files")
    misc.add_argument("--default-block-size", type=int, default=None,
                      help="accepted for compatibility; sharding is mesh-driven")
    return p


@dataclasses.dataclass
class Options:
    """Parsed options + derived analysis selection."""

    args: argparse.Namespace
    analysis: Optional[str]

    @staticmethod
    def parse(argv: Optional[List[str]] = None) -> "Options":
        parser = build_parser()
        args = parser.parse_args(argv)
        if (args.region_size or args.region_overlap) and args.groups:
            raise OptionsError(
                "only one type of regional analysis is allowed: "
                "--region-size/--region-overlap or --groups "
                "(options.cpp:1582-1585)"
            )
        selected = [dest for _, dest, _ in ANALYSES if getattr(args, dest)]
        if len(selected) > 1:
            raise OptionsError(
                f"incompatible analyses selected together: {selected} "
                "(options.cpp:1229-1664 incompatibility checks)"
            )
        return Options(args=args, analysis=selected[0] if selected else None)

    def reml_options(self) -> REMLOptions:
        a = self.args
        return REMLOptions(
            max_iterations=a.reml_maxit,
            variance_convergence_threshold=a.variance_threshold,
            gradient_convergence_threshold=a.gradient_threshold,
            change_ai_step_threshold=a.ai_switch_threshold,
            allow_switch_from_ai_to_em=a.ai_em_switch,
            first_step_em=not a.no_first_em,
            step_weighting_constant=a.reml_qstep_scale,
            maximum_correlation_covariance_constrain=a.max_correlation,
            use_log_logistic_scale=a.use_log_logistic,
            variance_constrain_proportion=a.variance_constrain,
            reml_method_em=a.reml_method_em,
            gcta_mode=a.gcta_mode,
            use_ml=a.use_ml,
            initial_h2=a.initial_h2,
            exp_kernel_initial_factor=a.param_init_fac,
            parameter_unfix_after=a.steps_to_unfix,
        )

    def echo(self, log):
        """Echo parsed options to the log (options.h:309-310)."""
        log.message("Options:")
        for key, val in sorted(vars(self.args).items()):
            if val not in (None, False):
                log.message(f"  --{key.replace('_', '-')} {val if val is not True else ''}")
