from .sharding import get_mesh, make_sharded_chunk_runner  # noqa: F401
