"""cpg-tpu: TPU-native Compacting-Picking-Growing continual learning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ivclab/CPG
(NeurIPS 2019). See SURVEY.md for the reference structural analysis and
README.md for the design.
"""

from .core.state import CPGState, TaskEntry
from .ops.binarize import DEFAULT_THRESHOLD, binarize, ternarize

__version__ = "0.1.0"
