"""Platform diagnostics (port of examples/platform_diagnostics.c)."""

import jax

import cfd_tpu
from cfd_tpu.core.features import Backend, backend_get_name, \
    backend_is_available
from cfd_tpu import native

print(f"cfd_tpu {cfd_tpu.__version__}")
print(f"jax {jax.__version__}, default backend: {jax.default_backend()}")
print(f"devices: {jax.devices()}")
print(f"default dtype: {cfd_tpu.default_dtype()}")
print(f"x64 enabled: {jax.config.jax_enable_x64}")
print("backend availability:")
for b in Backend:
    print(f"  {backend_get_name(b):12s} {backend_is_available(b)}")
print(f"native I/O library: "
      f"{'available' if native.native_available() else 'python fallback'}")

from cfd_tpu.ops.pallas.cg_kernels import fused_kernels_available  # noqa
from cfd_tpu.ops.pallas.projection_kernels import (  # noqa
    projection_kernels_supported)
print(f"fused CG kernels at 512^3: {fused_kernels_available(512, 512, 512)}")
print(f"fused projection kernels at 512^3: "
      f"{projection_kernels_supported(512, 512, 512)}")
