from .edge_sharded import (  # noqa: F401
    get_mesh_2d,
    make_edge_sharded_decoder,
    make_model_parallel_chunk_runner,
)
from .sharding import get_mesh, make_sharded_chunk_runner  # noqa: F401
