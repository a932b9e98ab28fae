from .bp import DecodeResult, DecoderTables, make_flooding_decoder  # noqa: F401
