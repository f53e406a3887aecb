"""Runtime layer: mesh, precision policy, logging/timers, options.

Replaces the reference's L0/L5 layers (communicator.{h,cpp}, misc/message/
options/memusage) with single-controller JAX equivalents.
"""

from dissect_tpu.runtime.mesh import MeshContext, get_mesh_context, set_mesh_context
from dissect_tpu.runtime.dtypes import Policy, default_policy
from dissect_tpu.runtime.log import Message, get_logger
from dissect_tpu.runtime.timers import Timers, timers

__all__ = [
    "MeshContext",
    "get_mesh_context",
    "set_mesh_context",
    "Policy",
    "default_policy",
    "Message",
    "get_logger",
    "Timers",
    "timers",
]
