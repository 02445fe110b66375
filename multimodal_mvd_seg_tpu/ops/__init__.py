from .persistence import (cubical_persistence_pairs, betti_numbers,
                          simplicial_persistence_pairs)
from .wasserstein import wasserstein_distance
