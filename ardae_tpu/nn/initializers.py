"""Initializers matching the reference's (PyTorch-1.2) parameter statistics.

The reference's small nets are sensitive to init scale (several models call
reset_parameters with N(0,1) output heads), so we replicate:
  * torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for the kernel, U(+-1/sqrt(fan_in)) for the bias.
  * xavier_uniform (models/ivae/mnist.py:20-25 weight_init).
  * N(0, 1) heads (e.g. models/ivae/toy.py:146-147 reset_parameters).

Flax kernels are stored (in, out): fan_in = shape[0]. Biases are initialized
inside our Linear modules where fan_in is known.
"""

import math

import jax
import jax.numpy as jnp


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)); equals kaiming_uniform(a=sqrt(5)) for linear."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def uniform_bound_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_init(stddev=1.0, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """U(+-sqrt(6/(fan_in+fan_out))) on an (in, out) kernel."""
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv2d default on an HWIO kernel: fan_in = H*W*I."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform_conv_init(key, shape, dtype=jnp.float32):
    """Xavier-uniform on an HWIO conv kernel (torch fan convention)."""
    rf = shape[0] * shape[1]
    fan_in, fan_out = shape[2] * rf, shape[3] * rf
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
