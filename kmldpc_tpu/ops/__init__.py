from .encode import make_encoder  # noqa: F401
from .modem import ModemTables, make_mapper, make_soft_demapper  # noqa: F401
from .channel import fading_awgn_channel  # noqa: F401
from .source import random_bits  # noqa: F401
