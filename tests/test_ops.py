"""Unit tests for pure device ops: patchify, masking, augmentation, schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssrl_vit_mae_jepa_tpu.ops.patches import patchify, unpatchify
from ssrl_vit_mae_jepa_tpu.ops.masking import (
    get_at_index,
    get_at_index_mm,
    num_masked_tokens,
    random_token_mask,
    repeat_token,
    set_at_index,
)
from ssrl_vit_mae_jepa_tpu.ops.augment import (
    eval_transform,
    normalize,
    random_resized_crop_flip_normalize,
)
from ssrl_vit_mae_jepa_tpu.training.schedules import (
    effective_pretrain_lr,
    mask_ratio_at_epoch,
    warmup_cosine_factor,
)


class TestPatches:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 96, 96, 3)))
        p = patchify(x, 8)
        assert p.shape == (2, 144, 192)
        x2 = unpatchify(p, 8, 3)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=1e-6)

    def test_layout_matches_torch_chw_flatten(self):
        """Patch tokens must flatten CHW-within-patch like lightly's patchify."""
        rng = np.random.default_rng(1)
        img = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
        p = np.asarray(patchify(jnp.asarray(img), 8))
        # patch (gy=2, gx=5) → token index 2*12+5; element (c=1, py=3, px=4)
        tok = p[0, 2 * 12 + 5]
        expected = img[0, 2 * 8 + 3, 5 * 8 + 4, 1]
        np.testing.assert_allclose(tok[1 * 64 + 3 * 8 + 4], expected, rtol=1e-6)

    def test_row_major_patch_order(self):
        img = np.zeros((1, 96, 96, 3), dtype=np.float32)
        img[0, 0:8, 8:16, :] = 1.0  # patch (0, 1)
        p = np.asarray(patchify(jnp.asarray(img), 8))
        assert p[0, 1].sum() == 192
        assert p[0, 0].sum() == 0

    def test_patchify_hcw_matches_patchify(self):
        """patchify_hcw from (B,H,C,W) ≡ patchify from the NHWC transpose."""
        from ssrl_vit_mae_jepa_tpu.ops.patches import patchify_hcw

        x_hcw = jnp.asarray(
            np.random.default_rng(7).normal(size=(2, 96, 3, 96)).astype(np.float32)
        )
        via_nhwc = patchify(jnp.transpose(x_hcw, (0, 1, 3, 2)), 8)
        direct = patchify_hcw(x_hcw, 8)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_nhwc))


class TestMasking:
    def test_counts(self):
        # L=145, ratio .75 → 108 masked, 37 kept (incl CLS) — SURVEY.md §0
        assert num_masked_tokens(145, 0.75) == 108

    def test_invariants(self, rng):
        B, L = 8, 145
        n_mask = num_masked_tokens(L, 0.75)
        idx_keep, idx_mask = random_token_mask(rng, B, L, n_mask)
        assert idx_keep.shape == (B, L - n_mask)
        assert idx_mask.shape == (B, n_mask)
        assert (idx_keep[:, 0] == 0).all()  # CLS always kept
        assert (idx_mask > 0).all()  # CLS never masked
        for b in range(B):
            union = np.union1d(np.asarray(idx_keep[b]), np.asarray(idx_mask[b]))
            np.testing.assert_array_equal(union, np.arange(L))

    def test_per_sample_randomness(self, rng):
        idx_keep, _ = random_token_mask(rng, 4, 145, 108)
        assert not np.array_equal(np.asarray(idx_keep[0]), np.asarray(idx_keep[1]))

    def test_uniform_marginal(self):
        """Each non-CLS token should be masked ≈ mask_ratio of the time."""
        key = jax.random.PRNGKey(42)
        B, L, n_mask = 2048, 17, 8
        _, idx_mask = random_token_mask(key, B, L, n_mask)
        counts = np.bincount(np.asarray(idx_mask).ravel(), minlength=L)
        assert counts[0] == 0
        freq = counts[1:] / B
        np.testing.assert_allclose(freq, n_mask / (L - 1), atol=0.05)

    def test_gather_scatter(self):
        tokens = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        idx = jnp.array([[0, 2], [4, 1]])
        got = get_at_index(tokens, idx)
        np.testing.assert_array_equal(np.asarray(got[0, 1]), np.asarray(tokens[0, 2]))
        np.testing.assert_array_equal(np.asarray(got[1, 0]), np.asarray(tokens[1, 4]))
        base = jnp.zeros((2, 5, 3))
        put = set_at_index(base, idx, got)
        np.testing.assert_array_equal(np.asarray(put[0, 2]), np.asarray(tokens[0, 2]))
        np.testing.assert_array_equal(np.asarray(put[1, 4]), np.asarray(tokens[1, 4]))
        assert np.asarray(put[0, 1]).sum() == 0

    def test_gather_mm_backward_matches_plain(self, rng):
        """get_at_index_mm: identical forward, one-hot-matmul VJP equals the
        scatter-add VJP of the plain gather — including repeated indices."""
        tokens = jax.random.normal(rng, (3, 7, 5))
        idx = jnp.array([[0, 2, 2], [6, 1, 0], [3, 3, 3]])  # repeats stress add
        g = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 5))

        np.testing.assert_array_equal(
            np.asarray(get_at_index_mm(tokens, idx)),
            np.asarray(get_at_index(tokens, idx)),
        )
        ref = jax.grad(lambda t: jnp.sum(get_at_index(t, idx) * g))(tokens)
        mm = jax.grad(lambda t: jnp.sum(get_at_index_mm(t, idx) * g))(tokens)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(ref), atol=1e-6)

    def test_scatter_mm_matches_plain(self, rng):
        """set_at_index_mm ≡ set_at_index for unique indices, values and
        gradients (both input paths)."""
        from ssrl_vit_mae_jepa_tpu.ops.masking import set_at_index_mm

        tokens = jax.random.normal(rng, (3, 7, 5))
        value = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 5))
        idx = jnp.array([[0, 2, 5], [6, 1, 0], [3, 4, 2]])
        g = jax.random.normal(jax.random.fold_in(rng, 2), (3, 7, 5))

        np.testing.assert_allclose(
            np.asarray(set_at_index_mm(tokens, idx, value)),
            np.asarray(set_at_index(tokens, idx, value)), atol=1e-6,
        )
        for argnum in (0, 1):
            ref = jax.grad(
                lambda t, v: jnp.sum(set_at_index(t, idx, v) * g), argnums=argnum
            )(tokens, value)
            mm = jax.grad(
                lambda t, v: jnp.sum(set_at_index_mm(t, idx, v) * g),
                argnums=argnum,
            )(tokens, value)
            np.testing.assert_allclose(np.asarray(mm), np.asarray(ref), atol=1e-6)

    def test_repeat_token(self):
        t = jnp.arange(3, dtype=jnp.float32).reshape(1, 1, 3)
        out = repeat_token(t, (4, 7))
        assert out.shape == (4, 7, 3)
        np.testing.assert_array_equal(np.asarray(out[3, 6]), np.asarray(t[0, 0]))


class TestAugment:
    def test_normalize_range(self):
        x = jnp.array([[[[0], [255], [128]]]], dtype=jnp.uint8)
        out = np.asarray(normalize(x))
        np.testing.assert_allclose(out.ravel(), [-1.0, 1.0, 128 * 2 / 255 - 1], atol=1e-6)

    def test_train_aug_shapes_and_range(self, rng):
        imgs = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (4, 96, 96, 3), dtype=np.uint8)
        )
        out = random_resized_crop_flip_normalize(rng, imgs)
        assert out.shape == (4, 96, 96, 3)
        o = np.asarray(out)
        assert o.min() >= -1.001 and o.max() <= 1.001
        # different examples get different crops
        assert not np.allclose(o[0], o[1])

    def test_eval_transform_identity_geometry(self):
        imgs = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 96, 96, 3), dtype=np.uint8)
        )
        out = np.asarray(eval_transform(imgs))
        expected = np.asarray(imgs).astype(np.float32) * 2 / 255 - 1
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_aug_deterministic_under_same_key(self, rng):
        imgs = jnp.asarray(
            np.random.default_rng(3).integers(0, 256, (2, 96, 96, 3), dtype=np.uint8)
        )
        a = np.asarray(random_resized_crop_flip_normalize(rng, imgs))
        b = np.asarray(random_resized_crop_flip_normalize(rng, imgs))
        np.testing.assert_array_equal(a, b)

    def test_flip_fold_is_output_column_reverse(self):
        """flip=True ≡ reversing the output columns of flip=False, exactly.

        Guards the round-5 coordinate-level flip fold (the reverse now runs
        on the (B, out) source coordinates, not the weight matrix)."""
        from ssrl_vit_mae_jepa_tpu.ops.augment import apply_augment

        imgs = jnp.asarray(
            np.random.default_rng(4).integers(0, 256, (3, 96, 96, 3), dtype=np.uint8)
        )
        u = jnp.asarray(np.random.default_rng(5).uniform(size=(3, 4)), jnp.float32)
        no_flip = np.asarray(
            apply_augment(u, jnp.zeros((3,), bool), imgs, out_size=96)
        )
        flipped = np.asarray(
            apply_augment(u, jnp.ones((3,), bool), imgs, out_size=96)
        )
        np.testing.assert_array_equal(flipped, no_flip[:, :, ::-1, :])

    def test_apply_augment_patches_exact(self):
        """apply_augment_patches ≡ patchify(apply_augment(...)) bit-exactly
        (same GEMMs, same order — only the pixel reordering route differs)."""
        from ssrl_vit_mae_jepa_tpu.ops.augment import (
            apply_augment, apply_augment_patches, draw_augment_params,
        )
        from ssrl_vit_mae_jepa_tpu.ops.patches import patchify

        imgs = jnp.asarray(
            np.random.default_rng(6).integers(0, 256, (4, 96, 96, 3), dtype=np.uint8)
        )
        u, flip = draw_augment_params(jax.random.PRNGKey(12), 4)
        via_images = patchify(apply_augment(u, flip, imgs, out_size=96), 8)
        direct = apply_augment_patches(u, flip, imgs, patch_size=8, out_size=96)
        assert direct.shape == (4, 144, 192)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_images))


class TestSchedules:
    def test_matches_reference_formula(self):
        """Factor must equal min((e+1)/warmup,1)*0.5*(1+cos(pi*e/total)) — Q2."""
        import math

        warmup, total = 20, 800
        for e in [0, 1, 5, 19, 20, 100, 799]:
            expected = min((e + 1) / warmup, 1.0) * 0.5 * (
                1 + math.cos(math.pi * e / total)
            )
            got = float(warmup_cosine_factor(e, warmup, total))
            assert abs(got - expected) < 1e-6, (e, got, expected)

    def test_lr_batch_scaling_pretrain_only(self):
        assert effective_pretrain_lr(1.5e-4, 2000) == pytest.approx(
            1.5e-4 * 2000 / 256
        )

    def test_mask_ramp(self):
        # reference denominator is ramp_epochs - 1 (src/training/mae.py:78-83)
        assert mask_ratio_at_epoch(0, 0.5, 0.85, 5) == pytest.approx(0.5)
        assert mask_ratio_at_epoch(4, 0.5, 0.85, 5) == pytest.approx(0.85)
        assert mask_ratio_at_epoch(2, 0.5, 0.85, 5) == pytest.approx(0.675)
        assert mask_ratio_at_epoch(100, 0.5, 0.85, 5) == pytest.approx(0.85)
        # constant ramp (start == end) stays constant
        assert mask_ratio_at_epoch(3, 0.75, 0.75, 5) == pytest.approx(0.75)


class TestAugmentGeometry:
    """Exactness properties of the on-device RandomResizedCrop."""

    def test_identity_when_scale_one(self, rng):
        """scale=(1,1), aspect forced square → crop is the full image →
        bilinear resample must be the identity."""
        from ssrl_vit_mae_jepa_tpu.ops import augment as A

        imgs = jnp.asarray(
            np.random.default_rng(5).integers(0, 256, (3, 96, 96, 3), dtype=np.uint8)
        )
        out = np.asarray(
            A.random_resized_crop_flip_normalize(
                rng, imgs, scale=(1.0, 1.0), ratio=(1.0, 1.0)
            )
        )
        expected = np.asarray(imgs).astype(np.float32) * 2 / 255 - 1
        flipped = expected[:, :, ::-1, :]
        for i in range(3):
            ok = np.allclose(out[i], expected[i], atol=1e-4) or np.allclose(
                out[i], flipped[i], atol=1e-4
            )
            assert ok, f"image {i}: identity crop not exact (max err "\
                f"{min(np.abs(out[i]-expected[i]).max(), np.abs(out[i]-flipped[i]).max())})"

    def test_constant_image_invariant(self, rng):
        """Any crop/resize of a constant image must stay constant —
        catches resampling weights that don't sum to 1."""
        from ssrl_vit_mae_jepa_tpu.ops.augment import random_resized_crop_flip_normalize

        imgs = jnp.full((4, 96, 96, 3), 100, jnp.uint8)
        out = np.asarray(random_resized_crop_flip_normalize(rng, imgs))
        np.testing.assert_allclose(out, 100 * 2 / 255 - 1, atol=1e-3)

    def test_flip_rate_near_half(self):
        from ssrl_vit_mae_jepa_tpu.ops.augment import random_resized_crop_flip_normalize

        rng0 = np.random.default_rng(0)
        imgs = np.zeros((256, 96, 96, 3), np.uint8)
        imgs[:, :, :48, :] = 255  # left half white
        out = np.asarray(
            random_resized_crop_flip_normalize(
                jax.random.PRNGKey(11), jnp.asarray(imgs), scale=(0.99, 1.0)
            )
        )
        left_bright = out[:, :, :20, :].mean(axis=(1, 2, 3))
        right_bright = out[:, :, -20:, :].mean(axis=(1, 2, 3))
        flip_frac = float((right_bright > left_bright).mean())
        assert 0.35 < flip_frac < 0.65, flip_frac

    def test_crop_zooms_in(self, rng):
        """At scale 0.8 the crop should (usually) magnify content: a centered
        disk should cover more output pixels on average than input pixels."""
        from ssrl_vit_mae_jepa_tpu.ops.augment import random_resized_crop_flip_normalize

        yy, xx = np.mgrid[:96, :96]
        disk = ((yy - 48) ** 2 + (xx - 48) ** 2 < 30**2)
        img = np.where(disk[..., None], 255, 0).astype(np.uint8)
        imgs = jnp.asarray(np.tile(img[None], (64, 1, 1, 1)))
        out = np.asarray(
            random_resized_crop_flip_normalize(
                jax.random.PRNGKey(3), imgs, scale=(0.8, 0.8)
            )
        )
        frac_in = disk.mean()
        frac_out = (out > 0).mean()
        assert frac_out > frac_in * 1.05, (frac_in, frac_out)
