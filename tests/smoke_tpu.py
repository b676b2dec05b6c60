"""TPU environment smoke script (NOT a pytest test — run directly).

The TPU counterpart of the reference's ``tests/test_cuda_torch.py``: checks
accelerator availability, runs a large matmul with honest completion timing,
and times a host↔device round trip. Exits 1 if no TPU is attached.

Usage: python tests/smoke_tpu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    devices = jax.devices()
    print(f"devices: {devices}")
    if devices[0].platform != "tpu":
        print("❌ No TPU detected")
        return 1
    print(f"✅ TPU detected: {devices[0].device_kind}")

    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    mm = jax.jit(lambda a: jnp.tanh(a @ a))
    y = mm(a)
    _ = np.asarray(y[0, 0])  # warm + completion fetch
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        y = mm(y)
    _ = np.asarray(y[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{n}x{n} bf16 matmul: {dt * 1e3:.2f} ms → "
          f"{2 * n**3 / dt / 1e12:.1f} TFLOP/s")

    x_host = np.random.default_rng(0).standard_normal((64, 96, 96, 3)).astype(np.float32)
    t0 = time.perf_counter()
    x_dev = jax.device_put(x_host)
    back = np.asarray(x_dev)
    print(f"H2D+D2H roundtrip ({x_host.nbytes / 1e6:.1f} MB): "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms")
    assert np.array_equal(back, x_host)
    print("✅ Transfer roundtrip exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
