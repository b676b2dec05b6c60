"""Real-TPU kernel smoke: run every production Pallas path at every
production shape, fwd + bwd, and compare against the XLA reference.

Interpret-mode tests (tests/test_block_kernel.py, tests/test_attention.py)
prove the math; this script proves the MOSAIC LOWERING on hardware —
the failure mode it exists for is a hard device fault, not a numeric
mismatch (measured: the fused-qkv stacked kernel and the fused-block
kernels crash the v5e worker at sub-lane-tile dims like the JEPA
predictor's L=145/D=96/d=16; see ops/attention.py policy docstrings).
Run it after ANY kernel or kernel-policy change, BEFORE a long training
run:

    python tests/smoke_tpu_kernels.py

Each case runs in-process sequentially; a device fault kills the script
at the offending case (named in the output), which is the diagnostic.
Not collected by pytest (module-level guard requires a TPU).
"""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    if jax.devices()[0].platform != "tpu":
        print("no TPU backend — smoke skipped")
        return 0
    from ssrl_vit_mae_jepa_tpu.models.vit import Block

    rng = np.random.default_rng(0)
    ok = True
    # (B, L, D, H): MAE encoder, MAE decoder/classifier, JEPA target encoder,
    # JEPA context encoder, JEPA predictor (D=96: auto now routes to the
    # lane-PADDED split kernels, "split_pad" — D zero-padded to 128). The
    # predictor AND the JEPA target encoder run at BOTH small and reference
    # batch — the D<128 fault class is batch-dependent (B=2000/G=4 crashed
    # where B<=768 ran clean), so a small-batch pass is NOT sufficient
    # evidence; (2000, 145, 144) covers the grid-250 fused-block
    # configuration of the round-2 batch-2000 suspect list (bisected clean
    # in round 3, docs/PERFORMANCE.md). (100, 145, 96): no legal flat image
    # group → exercises the RETAINED G=1-pinned split-stacked fallback.
    cases = [(64, 37, 144, 6), (64, 145, 192, 6), (64, 145, 144, 6),
             (64, 45, 144, 6), (64, 145, 96, 6), (2000, 145, 96, 6),
             (2000, 145, 144, 6), (100, 145, 96, 6)]
    for B, L, D, H in cases:
        x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        auto = Block(D, H, dtype=jnp.bfloat16, attn_impl="auto")
        ref = Block(D, H, dtype=jnp.bfloat16, attn_impl="xla")
        params = jax.jit(ref.init)(jax.random.key(0), x)

        def loss(blk):
            # x/g are ARGUMENTS, not closure constants: the axon relay
            # rejects jitted programs with large embedded constants
            return lambda p, x, g: (blk.apply(p, x).astype(jnp.float32) * g).sum()

        # grads w.r.t. params exercise all weight-gradient accumulators
        lf, gf = jax.jit(jax.value_and_grad(loss(auto)))(params, x, g)
        lr, gr = jax.jit(jax.value_and_grad(loss(ref)))(params, x, g)
        rel = abs(float(lf) - float(lr)) / max(1.0, abs(float(lr)))
        gerr = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
        )
        good = rel < 2e-2 and gerr < 2e-2  # bf16 accumulation-order noise
        ok &= good
        print(f"Block B={B:4d} L={L:3d} D={D:3d} H={H}  loss-rel {rel:.2e}  "
              f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
