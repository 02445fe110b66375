"""topologylayer-parity package (reference nnunetv2/training/topologylayer).

Deliberate deviation, for the record: the reference vendors a SECOND copy
of every layer backed by Dionysus (functional/{alpha,levelset,rips}_dionysus
.py, nn/*_dionysus.py, util/*_dionysus.py) alongside its own C++ extension.
Both backends compute the same persistence diagrams for the same complexes;
the Dionysus set exists only as an alternative dependency binding. This
rebuild implements the math once against our own C++ persistence core
(ops/native/persistence.cpp) and does NOT reproduce the Dionysus-bound
duplicates — same layer inventory, one backend (dropped in round 2; see
IMPLEMENTATION_NOTES.md)."""

from .levelset import LevelSetLayer, LevelSetLayer1D, LevelSetLayer2D, LevelSetLayer3D
from .features import (SumBarcodeLengths, TopKBarcodeLengths,
                       PartialSumBarcodeLengths, BarcodePolyFeature)
from .rips import RipsLayer
from .alpha import AlphaLayer
