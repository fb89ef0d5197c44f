"""Parameter initializers.

All dense layers use the fan-in uniform scheme so training dynamics match the
reference (torch Linear / Conv2d kaiming_uniform(a=sqrt(5)) reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); GRU params are U(-1/sqrt(hidden), ...)).
"""

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    return uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype=dtype)
