"""Bisect the chain-kernel L=37 hardware divergence (VERDICT r4 #4).

RESOLVED (round 5, measured on v5e): the kernel was CORRECT all along —
the round-4 "loss-rel 2.3e-1 MISMATCH" at `Chain B=64 L=37 D=144 H=6 N=4`
was catastrophic cancellation in the TEST STATISTIC, not kernel error.
The smoke's scalar readout sums B·L·D signed terms whose absolute mass is
~2.9e5 while the signed sum is ~15 (a 1e4:1 cancellation at this shape's
RNG draw); the chain-vs-XLA absolute loss difference of ~8 is 2.7e-5 of
the mass — ordinary chained-bf16 rounding — but 51% of the tiny signed
sum. Direct output-tensor comparison at every chain prefix n=1..4 shows
max-abs 0.03-0.06 on scale ~6 (≈1%, same as every passing shape). The
smoke now gates on the on-device output max-abs error and gives the loss
statistic a term-mass denominator floor (tests/smoke_tpu_kernels.py).

Kept as the reproducer/diagnostic: runs the chain vs the XLA reference at
a matrix of (N, G, L) around the formerly-misreported point and prints
BOTH the signed-loss rel and the output-tensor rel per case. TPU-only;
bounded runtime. (Historical note: with `SSRL_ATTN_GROUPED=0` pinned, the
signed-loss rel still reads 5.1e-1 at L=37/N=4 while out-rel stays ~1% —
the cancellation artifact on demand.)
"""

import os
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_case(B, L, D, H, N, group=None):
    if group is not None:
        os.environ["SSRL_BLOCK_GROUP"] = str(group)
    else:
        os.environ.pop("SSRL_BLOCK_GROUP", None)
    from ssrl_vit_mae_jepa_tpu.models.vit import Block, _block_tree
    from ssrl_vit_mae_jepa_tpu.ops.block_chain import (
        _chain_ok_keyed,
        fused_block_chain,
    )

    _chain_ok_keyed.cache_clear()
    rng = np.random.default_rng(0)
    F = 4 * D
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    params = [
        (jnp.ones((D,)), jnp.zeros((D,)), mk((D, 3 * D)), mk((3 * D,)),
         mk((D, D)), mk((D,)), jnp.ones((D,)), jnp.zeros((D,)),
         mk((D, F)), mk((F,)), mk((F, D)), mk((D,)))
        for _ in range(N)
    ]

    def chain_loss(plist, x, g):
        return (fused_block_chain(x, plist, H).astype(jnp.float32) * g).sum()

    blk = Block(D, H, dtype=jnp.bfloat16, attn_impl="xla", parent=None)

    def ref_loss(plist, x, g):
        for p in plist:
            x = blk.apply({"params": _block_tree(p)}, x)
        return (x.astype(jnp.float32) * g).sum()

    @jax.jit
    def out_err(plist, x):
        co = fused_block_chain(x, plist, H).astype(jnp.float32)
        ro = x
        for p in plist:
            ro = blk.apply({"params": _block_tree(p)}, ro)
        ro = ro.astype(jnp.float32)
        return jnp.max(jnp.abs(co - ro)), jnp.max(jnp.abs(ro))

    lfwd = float(jax.jit(chain_loss)(params, x, g))
    lf, _ = jax.jit(jax.value_and_grad(chain_loss))(params, x, g)
    lr = float(jax.jit(ref_loss)(params, x, g))
    oerr, oscale = (float(v) for v in out_err(params, x))
    prim = abs(float(lf) - lr) / max(1.0, abs(lr))
    fwd = abs(lfwd - lr) / max(1.0, abs(lr))
    print(f"B={B} L={L} D={D} N={N} G={group or 'auto'}  "
          f"primal-rel {prim:.2e}  fwd-only-rel {fwd:.2e}  "
          f"out-rel {oerr / max(oscale, 1e-6):.2e}", flush=True)


def main():
    if jax.devices()[0].platform != "tpu":
        print("needs TPU")
        return 1
    B, D, H = 64, 144, 6
    # N sweep at the failing L
    for N in (2, 3, 4):
        run_case(B, 37, D, H, N)
    # G sweep at the failing point (auto picks 8; odd L needs 8 | G·L,
    # so 16 is the only other valid choice at B=64)
    run_case(B, 37, D, H, 4, group=16)
    # neighboring L (L=40: 8-aligned rows per image; L=45: odd like 37)
    for L in (40, 45):
        run_case(B, L, D, H, 4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
