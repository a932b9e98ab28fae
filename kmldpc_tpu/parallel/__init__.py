from .edge_sharded import make_edge_sharded_decoder  # noqa: F401
from .sharding import get_mesh, make_sharded_chunk_runner  # noqa: F401
