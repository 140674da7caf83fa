from .mesh import make_mesh, batch_sharding, replicate_sharding, shard_batch  # noqa: F401
from .tp import make_mesh_2d, tp_shardings, shard_tree  # noqa: F401
