"""Analysis/workflow layer: the user-facing analyses and the CLI.

Replaces analysis.{h,cpp} (dispatcher), simulatephenotype.{h,cpp},
predictphenotype.{h,cpp} and main.cpp/options.{h,cpp} (CLI surface).
"""

from dissect_tpu.analysis.simulate import simulate_phenotypes, SimulationResult
from dissect_tpu.analysis.predict import predict_phenotypes, read_snp_effects
