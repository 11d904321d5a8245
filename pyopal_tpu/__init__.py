"""pyopal_tpu — a TPU-native database-search aligner.

A from-scratch, TPU-first framework with the capabilities of
PyOpal/Opal (reference: ``althonos/pyopal`` v0.7.3): one query scored
against every sequence of a database with four affine-gap DP algorithms
— Smith-Waterman local (``sw``), Needleman-Wunsch global (``nw``) and
two semi-global variants (``hw``, ``ov``) — in three result modes
(score, score+ends, full alignment with traceback).

Where Opal vectorizes across CPU SIMD lanes and threads, this package
maps one database sequence per TPU vector lane inside a Pallas kernel
(profile lookups ride the MXU as one-hot matmuls), batches
length-bucketed padded blocks from HBM, and scales over device meshes
with ``jax.sharding`` collectives.

Example:
    >>> import pyopal_tpu
    >>> targets = ["AACCGCTG", "ATGCGCT", "TTATTACG"]
    >>> for res in pyopal_tpu.align("ACCTG", targets, gap_open=2, ordered=True):
    ...     print(res.score, targets[res.target_index])
    41 AACCGCTG
    31 ATGCGCT
    23 TTATTACG

"""

__version__ = "0.5.1"
__author__ = "pyopal_tpu developers"
__license__ = "MIT"
__all__ = [
    "Alphabet",
    "Aligner",
    "AlignFuture",
    "BaseDatabase",
    "Database",
    "ScoreResult",
    "EndResult",
    "FullResult",
    "ScoringMatrix",
    "align",
    "read_fasta",
    "save_database",
    "load_database",
    "__version__",
]

# Bootstrap the native extensions before the submodules that bind them
# (source checkouts compile in place on first import; wheels ship them
# prebuilt; pure-Python fallbacks cover failure).
from . import native as _native

_native.ensure_built()

from ._align import align
from .alphabet import Alphabet
from .aligner import Aligner, AlignFuture
from .database import BaseDatabase, Database
from .io import load_database, read_fasta, save_database
from .matrices import ScoringMatrix
from .results import EndResult, FullResult, ScoreResult
from .utils.deviceinfo import _device_info
