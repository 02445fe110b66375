from .levelset import LevelSetLayer, LevelSetLayer1D, LevelSetLayer2D, LevelSetLayer3D
from .features import (SumBarcodeLengths, TopKBarcodeLengths,
                       PartialSumBarcodeLengths, BarcodePolyFeature)
from .rips import RipsLayer
from .alpha import AlphaLayer
