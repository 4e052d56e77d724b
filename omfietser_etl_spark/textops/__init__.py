"""Training-data text operators: dedup, similarity, analysis.

All operators are JVM-side DataFrame compositions (no Python UDFs);
hashing uses exact integer arithmetic so the DuckDB oracle can
replicate results bit-for-bit. See ``constants`` for the shared
parameter set.
"""

from . import analysis, constants, dedup, similarity

__all__ = ["analysis", "constants", "dedup", "similarity"]
