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

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--section", default="all",
        choices=["all", "default", "grouped", "grouped2", "embed", "chain"],
        help="which kernel family to smoke. 'default' = the hardware-"
        "validated production paths only — run (and bench) it BEFORE the "
        "env-gated new-lever sections, whose failure mode is a hard device "
        "fault that takes the worker down for ~10-25 min",
    )
    args = parser.parse_args()
    sections = (
        {"default", "grouped", "grouped2", "embed", "chain"}
        if args.section == "all" else {args.section}
    )
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
    for B, L, D, H in (cases if "default" in sections else []):
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
        # no-grad forward: the custom_vjp PRIMAL path runs the stash-free
        # fwd-only kernels (JEPA target encoder / eval passes)
        lfwd = float(jax.jit(loss(auto))(params, x, g))
        fwd_rel = abs(lfwd - float(lr)) / max(1.0, abs(float(lr)))
        rel = max(
            abs(float(lf) - float(lr)) / max(1.0, abs(float(lr))), fwd_rel
        )
        gerr = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
        )
        good = rel < 2e-2 and gerr < 2e-2  # bf16 accumulation-order noise
        ok &= good
        print(f"Block B={B:4d} L={L:3d} D={D:3d} H={H}  loss-rel {rel:.2e}  "
              f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    # ---- head-group-split attention core at level 1 (aligned-only): the
    # round-4 score-lane lever, DEFAULT level 2 since round 5 (so the
    # "default" section above already covers grouped2 paths). This section
    # pins level 1 explicitly — only the D=192 decoder geometry activates
    # (slots align to the 128-lane tile); fwd+bwd at small and reference
    # batch, because each level is a distinct Mosaic lowering configuration.
    import os

    os.environ["SSRL_ATTN_GROUPED"] = "1"
    try:
        for B, L, D, H in (
            [(64, 145, 192, 6), (2000, 145, 192, 6)]
            if "grouped" in sections else []
        ):
            x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
            g = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
            auto = Block(D, H, dtype=jnp.bfloat16, attn_impl="auto")
            ref = Block(D, H, dtype=jnp.bfloat16, attn_impl="xla")
            params = jax.jit(ref.init)(jax.random.key(0), x)

            def loss(blk):
                return lambda p, x, g: (
                    blk.apply(p, x).astype(jnp.float32) * g
                ).sum()

            lf, gf = jax.jit(jax.value_and_grad(loss(auto)))(params, x, g)
            lr, gr = jax.jit(jax.value_and_grad(loss(ref)))(params, x, g)
            lfwd = float(jax.jit(loss(auto))(params, x, g))
            fwd_rel = abs(lfwd - float(lr)) / max(1.0, abs(float(lr)))
            rel = max(
                abs(float(lf) - float(lr)) / max(1.0, abs(float(lr))), fwd_rel
            )
            gerr = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                      / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
                for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
            )
            good = rel < 2e-2 and gerr < 2e-2
            ok &= good
            print(f"Grouped B={B:4d} L={L:3d} D={D:3d} H={H}  loss-rel {rel:.2e}  "
                  f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    finally:
        os.environ.pop("SSRL_ATTN_GROUPED", None)
    # ---- unaligned head-group split (SSRL_ATTN_GROUPED=2 — the round-5
    # DEFAULT, pinned explicitly here so the section stays meaningful even
    # if the default moves): also activates on the D=144 encoder via
    # any-offset spans — the historical fault class involved non-tile-offset
    # lane slices, so encoder AND decoder geometries run at small and
    # reference batch.
    os.environ["SSRL_ATTN_GROUPED"] = "2"
    try:
        for B, L, D, H in (
            [(64, 37, 144, 6), (64, 145, 144, 6), (64, 145, 192, 6),
             (2000, 145, 144, 6)]
            if "grouped2" in sections else []
        ):
            x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
            g = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
            auto = Block(D, H, dtype=jnp.bfloat16, attn_impl="auto")
            ref = Block(D, H, dtype=jnp.bfloat16, attn_impl="xla")
            params = jax.jit(ref.init)(jax.random.key(0), x)

            def loss(blk):
                return lambda p, x, g: (
                    blk.apply(p, x).astype(jnp.float32) * g
                ).sum()

            lf, gf = jax.jit(jax.value_and_grad(loss(auto)))(params, x, g)
            lr, gr = jax.jit(jax.value_and_grad(loss(ref)))(params, x, g)
            lfwd = float(jax.jit(loss(auto))(params, x, g))
            fwd_rel = abs(lfwd - float(lr)) / max(1.0, abs(float(lr)))
            rel = max(
                abs(float(lf) - float(lr)) / max(1.0, abs(float(lr))), fwd_rel
            )
            gerr = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                      / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
                for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
            )
            good = rel < 2e-2 and gerr < 2e-2
            ok &= good
            print(f"Grouped2 B={B:4d} L={L:3d} D={D:3d} H={H}  loss-rel {rel:.2e}  "
                  f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    finally:
        os.environ.pop("SSRL_ATTN_GROUPED", None)
    # ---- fused patch-embed prologue (SSRL_FUSED_EMBED=1, ops/embed_pallas):
    # embed GEMM + CLS + pos + mask gather in one kernel. Production
    # geometry is (N=144, Pc=192, D=144) with K=37 (MAE masked encode) or
    # K=None (classifier full sequence); batch-dependence per the D<128
    # fault history means the reference batch must be covered too.
    from ssrl_vit_mae_jepa_tpu.ops.embed_pallas import fused_patch_embed

    embed_cases = [(64, 144, 192, 144, 37), (768, 144, 192, 144, 37),
                   (2000, 144, 192, 144, 37), (768, 144, 192, 144, None)]
    for B, N, Pc, D, K in (embed_cases if "embed" in sections else []):
        L = N + 1
        patches = jnp.asarray(rng.standard_normal((B, N, Pc)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((Pc, D)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((D,)) * 0.05, jnp.float32)
        cls = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.02, jnp.float32)
        pos = jnp.asarray(rng.standard_normal((1, L, D)) * 0.02, jnp.float32)
        idx = None
        if K is not None:
            idx = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32),
                 jnp.argsort(
                     jnp.asarray(rng.standard_normal((B, N)), jnp.float32),
                     axis=-1,
                 )[:, : K - 1].astype(jnp.int32) + 1],
                axis=-1,
            )
        gy = jnp.asarray(
            rng.standard_normal((B, K if K else L, D)), jnp.float32
        )

        def fused_loss(patches, w, b, cls, pos, gy, idx=None):
            o = fused_patch_embed(patches, w, b, cls, pos, idx)
            return (o.astype(jnp.float32) * gy).sum()

        def ref_loss(patches, w, b, cls, pos, gy, idx=None):
            dt = patches.dtype
            x = jnp.dot(patches, w.astype(dt)) + b.astype(dt)
            cb = jnp.broadcast_to(cls.astype(dt), (B, 1, D))
            x = jnp.concatenate([cb, x], axis=1) + pos.astype(dt)
            if idx is not None:
                x = jnp.take_along_axis(x, idx[..., None], axis=1)
            return (x.astype(jnp.float32) * gy).sum()

        args = (patches, w, b, cls, pos, gy) + (() if idx is None else (idx,))
        lf, gf = jax.jit(jax.value_and_grad(fused_loss, argnums=(0, 1, 2, 3, 4)))(*args)
        lr, gr = jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3, 4)))(*args)
        rel = abs(float(lf) - float(lr)) / max(1.0, abs(float(lr)))
        gerr = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(c.astype(jnp.float32))) + 1e-6))
            for a, c in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
        )
        good = rel < 2e-2 and gerr < 2e-2
        ok &= good
        print(f"Embed B={B:4d} N={N} Pc={Pc} D={D} K={K}  loss-rel {rel:.2e}  "
              f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    # ---- weight-resident chain kernel (ops/block_chain.py): whole stacks
    # per pallas_call. (B, L, D, H, N): MAE encoder (depth 4), MAE decoder
    # (depth 2), JEPA target encoder, JEPA predictor (lane-padded D=96),
    # each at small AND reference batch.
    from ssrl_vit_mae_jepa_tpu.models.vit import Block, _block_tree
    from ssrl_vit_mae_jepa_tpu.ops.block_chain import fused_block_chain
    from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
        pad_attn_branch_params,
        pad_mlp_branch_params,
    )

    chain_cases = [
        (64, 37, 144, 6, 4), (64, 145, 192, 6, 2), (64, 145, 144, 6, 4),
        (64, 145, 96, 6, 2), (2000, 145, 96, 6, 2), (2000, 145, 144, 6, 4),
    ]
    for B, L, D, H, N in (chain_cases if "chain" in sections else []):
        F = 4 * D
        x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

        def mk(shape):
            return jnp.asarray(
                rng.standard_normal(shape) * 0.05, jnp.float32
            )

        params = [
            (jnp.ones((D,)), jnp.zeros((D,)), mk((D, 3 * D)), mk((3 * D,)),
             mk((D, D)), mk((D,)), jnp.ones((D,)), jnp.zeros((D,)),
             mk((D, F)), mk((F,)), mk((F, D)), mk((D,)))
            for _ in range(N)
        ]

        def chain_out(plist, x):
            if D < 128:
                pad = 128 - D
                xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
                padded = [
                    pad_attn_branch_params(*p[:6], pad)
                    + pad_mlp_branch_params(*p[6:], pad)
                    for p in plist
                ]
                return fused_block_chain(xp, padded, H, d_real=D)[..., :D]
            return fused_block_chain(x, plist, H)

        def chain_loss(plist, x, g):
            return (chain_out(plist, x).astype(jnp.float32) * g).sum()

        blk = Block(D, H, dtype=jnp.bfloat16, attn_impl="xla", parent=None)

        def ref_out(plist, x):
            for p in plist:
                x = blk.apply({"params": _block_tree(p)}, x)
            return x

        def ref_loss(plist, x, g):
            return (ref_out(plist, x).astype(jnp.float32) * g).sum()

        # PRIMARY forward gate: output-tensor max-abs error, computed on
        # device and fetched as ONE scalar (tunnel hygiene). The signed
        # scalar loss is a (B·L·D)-term dot whose terms cancel ~1e4:1 at
        # some shapes (L=37/N=4: |terms| mass ~3e5, signed sum ~15), so a
        # loss-relative check there measures CANCELLATION, not kernel
        # error — the round-4 "chain MISMATCH at L=37" was exactly that
        # artifact (outputs matched at 1% while loss-rel read 23-51%).
        @jax.jit
        def out_err(plist, x, g):
            co = chain_out(plist, x).astype(jnp.float32)
            ro = ref_out(plist, x).astype(jnp.float32)
            return (
                jnp.max(jnp.abs(co - ro)),
                jnp.max(jnp.abs(ro)),
                jnp.abs(co * g).sum(),
            )
        oerr, oscale, mass = (float(v) for v in out_err(params, x, g))
        out_rel = oerr / max(oscale, 1e-6)

        lf, gf = jax.jit(jax.value_and_grad(chain_loss))(params, x, g)
        lr, gr = jax.jit(jax.value_and_grad(ref_loss))(params, x, g)
        # no-grad forward: the custom_vjp PRIMAL runs the stash-free
        # fwd-only chain kernel (eval passes / probes through forced chain)
        lfwd = float(jax.jit(chain_loss)(params, x, g))
        # loss denominators include a term-mass floor so the statistic
        # stays meaningful under heavy cancellation (see out_err note)
        denom = max(1.0, abs(float(lr)), 1e-3 * mass)
        fwd_rel = abs(lfwd - float(lr)) / denom
        prim_rel = abs(float(lf) - float(lr)) / denom
        rel = max(prim_rel, fwd_rel)
        gerr = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-6))
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr))
        )
        # bf16 chained-blocks rounding: out_rel ~1% measured at N=4/D=144
        # on v5e; exact math is pinned at fp32 atol 3e-4 by
        # tests/test_block_kernel.py::TestChainKernel
        good = out_rel < 2e-2 and rel < 5e-2 and gerr < 2e-2
        ok &= good
        print(f"Chain B={B:4d} L={L:3d} D={D:3d} H={H} N={N}  "
              f"out-rel {out_rel:.2e}  loss-rel {rel:.2e}  "
              f"(primal {prim_rel:.2e} / fwd-only {fwd_rel:.2e})  "
              f"worst-grad-rel {gerr:.2e}  {'OK' if good else 'MISMATCH'}")
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
