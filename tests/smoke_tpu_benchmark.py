"""TPU train/infer micro-benchmark smoke script (NOT a pytest test).

The TPU counterpart of the reference's ``tests/test_cuda_benchmark.py``:
times training and inference steps of the flagship MAE config with warmup
and honest value-fetch completion barriers, and reports device memory stats.

Usage: python tests/smoke_tpu_benchmark.py [batch_size]
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

    if jax.devices()[0].platform != "tpu":
        print("❌ No TPU detected")
        return 1

    from ssrl_vit_mae_jepa_tpu.config import DEFAULTS
    from ssrl_vit_mae_jepa_tpu.models import mae_from_config
    from ssrl_vit_mae_jepa_tpu.ops.masking import num_masked_tokens, random_token_mask
    from ssrl_vit_mae_jepa_tpu.training.tasks import MAETask

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    pre = dict(DEFAULTS["pretrain"], batch_size=B)
    task = MAETask(DEFAULTS["model"], pre)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 256, (B, 96, 96, 3), dtype=np.uint8)),
        "label": jnp.full((B,), -1, jnp.int32),
        "weight": jnp.ones((B,), jnp.float32),
    }
    ctx = task.epoch_context(0)

    warmup, iters = 3, 10
    for _ in range(warmup):
        state, sums = task.train_step(state, batch, 0, ctx)
    float(sums["loss_sum"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, sums = task.train_step(state, batch, 0, ctx)
    float(sums["loss_sum"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (B={B}): {dt * 1e3:.1f} ms/iter → {B / dt:,.0f} img/s")

    mae = mae_from_config(DEFAULTS["model"])
    L = mae.sequence_length
    n_mask = num_masked_tokens(L, 0.75)
    idx_keep, idx_mask = random_token_mask(jax.random.PRNGKey(1), B, L, n_mask)
    images = jnp.zeros((B, 96, 96, 3), jnp.float32)

    @jax.jit
    def infer(p, images):
        pred, _ = mae.apply({"params": p}, images, idx_keep, idx_mask)
        return pred.sum()

    for _ in range(warmup):
        y = infer(state.params, images)
    float(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = infer(state.params, images)
    float(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"inference (B={B}): {dt * 1e3:.1f} ms/iter → {B / dt:,.0f} img/s")

    try:
        stats = jax.devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**20
        limit = stats.get("bytes_limit", 0) / 2**20
        print(f"device memory: {used:.0f} MiB in use / {limit:.0f} MiB limit")
    except Exception:
        print("device memory stats unavailable on this backend")
    return 0


if __name__ == "__main__":
    sys.exit(main())
