from .chain import ChunkResult, make_chunk_runner  # noqa: F401
from .montecarlo import Simulator, SnrResult  # noqa: F401
