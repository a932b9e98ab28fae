"""Information-bit source.

Reference: ``SourceSink::GetBitStr`` draws iid Bernoulli(0.5) bits from the
Park-Miller LC generator (``sourcesink.cc:4-9``).  We draw from counter-based
``jax.random`` keys instead — statistical, not bitwise, equivalence (SURVEY.md
section 7 design stance).
"""

import jax
import jax.numpy as jnp


def random_bits(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """iid uniform bits as int8 of the given shape."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8)
