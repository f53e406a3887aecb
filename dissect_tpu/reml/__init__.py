"""REML layer: the AI-REML engine and its analysis drivers.

Replaces reml.{h,cpp} (engine), singlereml.{h,cpp} / multireml.{h,cpp}
(drivers) with a jitted quantities core + float64 host Newton loop —
the single-controller analog of the reference's root-computes/broadcast
discipline (misc.gt, communicator->broadcast).
"""

from dissect_tpu.reml.engine import REMLEngine, REMLOptions, REMLResult
from dissect_tpu.reml.single import SingleREML
from dissect_tpu.reml.multi import MultiREML
