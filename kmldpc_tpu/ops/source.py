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


def random_symbols(key: jax.Array, qary: int, shape: tuple[int, ...]) -> jax.Array:
    """iid uniform q-ary symbols in [0, qary).

    Reference: ``SourceSink::GetSymStr`` (sourcesink.cc:12-19) — rejection
    loop over ``qary * Uniform()``; here a direct categorical draw with the
    same distribution.
    """
    return jax.random.randint(key, shape, 0, qary, dtype=jnp.int32)
