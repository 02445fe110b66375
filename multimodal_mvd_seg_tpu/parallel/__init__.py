from .mesh import get_mesh, data_sharding, replicated_sharding
