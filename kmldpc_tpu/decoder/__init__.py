from .bp import DecodeResult, DecoderTables, make_flooding_decoder  # noqa: F401
from .bp_em import (  # noqa: F401
    flooding_decode_em,
    flooding_decode_two_phase,
    two_phase_generic,
)
from .minsum import (  # noqa: F401
    MinsumTables,
    layered_minsum_decode,
    make_layered_minsum_decoder,
    minsum_tables,
)
