"""Device (JAX/XLA/Pallas) kernel tier.

The persistent XLA compile cache for these kernels is configured once at
package import (see lambdaworks_kzg_tpu/__init__.py, LWKZG_COMPILE_CACHE);
this package adds no knobs of its own.
"""
