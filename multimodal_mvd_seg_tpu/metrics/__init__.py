from .topology_metrics import (betti_number, compute_persistence_diagram,
                               getBetti, binary_skeleton, clDice, cal_clDice)
