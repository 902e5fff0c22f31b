"""WmForger subsystem tests (reference wmforger/train.py:127-139,398-480 and
wmforger/wmforger/modules/watermark_generators.py:139-263).

Covers: the BCE / Bradley-Terry preference losses against closed forms, the
adversarial gradient-perturbation inner loop (score must rise monotonically),
FFT generator spectral structure, embed quantization semantics, one
optimize_image ascent, and a 2-step training smoke through the CLI."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from videoseal_tpu.wmforger.train import (adversarial_perturb, construct_loss,
                                          main as wmforger_main,
                                          make_train_step)
from videoseal_tpu.wmforger.generators import (FFTWatermarkGaussian,
                                               FFTWatermarkLines,
                                               FFTWatermarkWaves,
                                               build_generator)


def _softplus(x):
    return np.logaddexp(0.0, x)


class TestLosses:
    def test_bce_closed_form(self):
        """bce(real,1)+bce(wm,0) == softplus(-real)+softplus(wm)
        (ref train.py:129-132)."""
        rng = np.random.default_rng(0)
        real = rng.normal(0, 3, (16,)).astype(np.float32)
        wm = rng.normal(0, 3, (16,)).astype(np.float32)
        got = float(construct_loss("bce")(jnp.asarray(real), jnp.asarray(wm)))
        want = _softplus(-real).mean() + _softplus(wm).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bt_nll_closed_form(self):
        """Bradley-Terry / DPO Eq.(2): mean softplus(-(real-wm))
        (ref train.py:133-137)."""
        rng = np.random.default_rng(1)
        real = rng.normal(0, 3, (16,)).astype(np.float32)
        wm = rng.normal(0, 3, (16,)).astype(np.float32)
        got = float(construct_loss("bt_nll")(jnp.asarray(real),
                                             jnp.asarray(wm)))
        want = _softplus(-(real - wm)).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bt_invariant_to_common_shift(self):
        """BT only sees the margin: shifting both logit sets by a constant
        leaves the loss unchanged (the property that distinguishes it from
        BCE)."""
        rng = np.random.default_rng(2)
        real = jnp.asarray(rng.normal(0, 1, (8,)).astype(np.float32))
        wm = jnp.asarray(rng.normal(0, 1, (8,)).astype(np.float32))
        f = construct_loss("bt_nll")
        np.testing.assert_allclose(float(f(real, wm)),
                                   float(f(real + 5.0, wm + 5.0)), rtol=1e-5)

    def test_unknown_loss_raises(self):
        with pytest.raises(NotImplementedError):
            construct_loss("hinge")


class TestAdversarialPerturb:
    def test_score_rises_monotonically(self):
        """Each ascent step must raise mean score (ref train.py:463-480: the
        attacker maximizes the 'real' logit). Quadratic score keeps the
        check exact-ish and cheap."""
        target = jnp.full((2, 8, 8, 3), 0.5)

        def score_fn(x):
            # smooth concave score peaked at 0.5 — ascent moves x toward it
            return -jnp.sum(jnp.square(x - target), axis=(1, 2, 3))

        rng = np.random.default_rng(3)
        imgs_w = jnp.asarray(rng.uniform(0.2, 0.8, (2, 8, 8, 3)),
                             jnp.float32)
        key = jax.random.PRNGKey(0)
        scores = [float(jnp.mean(score_fn(imgs_w)))]
        for n in range(1, 4):
            out = adversarial_perturb(score_fn, imgs_w, key, n_steps=n,
                                      min_perturbation=1e-3,
                                      max_perturbation=5e-3)
            scores.append(float(jnp.mean(score_fn(out))))
        assert all(b > a for a, b in zip(scores, scores[1:])), scores

    def test_grad_sign_only_moves_by_lr(self):
        """use_grad_sign_only: every pixel moves by exactly lr in the ascent
        direction (FGSM-style, ref train.py:471-474)."""
        def score_fn(x):
            return jnp.sum(x)  # grad of -mean is a negative constant

        imgs_w = jnp.full((1, 4, 4, 3), 0.5)
        out = adversarial_perturb(score_fn, imgs_w, jax.random.PRNGKey(1),
                                  n_steps=1, min_perturbation=1e-2,
                                  max_perturbation=1e-2,
                                  use_grad_sign_only=True)
        np.testing.assert_allclose(np.asarray(out), 0.51, atol=1e-6)

    def test_output_clipped_to_unit_range(self):
        def score_fn(x):
            return jnp.sum(x) * 1e6

        imgs_w = jnp.full((1, 4, 4, 3), 0.99)
        out = adversarial_perturb(score_fn, imgs_w, jax.random.PRNGKey(2),
                                  n_steps=2, use_grad_sign_only=True,
                                  min_perturbation=0.5, max_perturbation=0.5)
        assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= 0.0


class TestGenerators:
    def setup_method(self):
        import random
        random.seed(0)
        np.random.seed(0)

    def test_waves_spectrum_sparse(self):
        """Waves synthesizes <=50 Fourier peaks (+ conjugate images), so the
        spectrum magnitude is sparse: tiny fraction of bins carries ~all the
        energy (ref generators.py:178-208)."""
        wm = FFTWatermarkWaves.generate_random_watermark_fft()
        assert wm.shape == (512, 512) and wm.dtype == np.float32
        mag = np.abs(np.fft.fft2(wm))
        big = mag > mag.max() * 1e-3
        assert big.sum() <= 200, big.sum()

    def test_gaussian_spectrum_decays_with_radius(self):
        """Gaussian shapes the spectrum with a radial envelope: low-frequency
        annulus energy dominates the high-frequency one
        (ref generators.py:210-232)."""
        wm = FFTWatermarkGaussian.generate_random_watermark_fft()
        mag = np.abs(np.fft.fftshift(np.fft.fft2(wm)))
        yy, xx = np.mgrid[:512, :512]
        r = np.hypot(yy - 256, xx - 256)
        low = mag[(r > 2) & (r < 60)].mean()
        high = mag[r > 200].mean()
        assert low > 10 * high, (low, high)

    def test_lines_energy_on_axes(self):
        """Lines puts energy on full spectrum rows/columns: the occupied
        bins form whole lines through the center
        (ref generators.py:235-263)."""
        wm = FFTWatermarkLines.generate_random_watermark_fft()
        mag = np.abs(np.fft.fftshift(np.fft.fft2(wm)))
        row_e = mag.sum(axis=1)     # energy per spectrum row
        col_e = mag.sum(axis=0)
        total = mag.sum()
        # a handful of rows+columns must carry essentially everything
        top_rows = np.sort(row_e)[-25:].sum()
        top_cols = np.sort(col_e)[-25:].sum()
        assert top_rows + top_cols > 0.9 * total

    def test_embed_quantizes_and_preserves_shape(self):
        rng = np.random.default_rng(4)
        imgs = rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)
        out = build_generator("waves").embed(imgs)["imgs_w"]
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        # 8-bit quantization (ref generators.py:174: round(x*255)/255)
        np.testing.assert_allclose(out * 255.0, np.round(out * 255.0),
                                   atol=1e-4)

    def test_build_generator_random_picks_one(self):
        g = build_generator("random")
        assert isinstance(g, (FFTWatermarkWaves, FFTWatermarkGaussian,
                              FFTWatermarkLines))


def _tiny_extractor(img_size=32):
    from videoseal_tpu.models.extractor import build_extractor
    spec = build_extractor("convnext_tiny", {
        "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 8, 8, 8]},
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": 8, "sigmoid_output": False}},
        img_size, nbits=0)
    variables = spec.module.init(
        jax.random.PRNGKey(0), np.zeros((1, img_size, img_size, 3),
                                        np.float32))
    return spec.module, variables["params"]


class TestTrainStep:
    @pytest.mark.parametrize("kwargs", [
        {},                                            # plain BT
        {"n_perturbation_steps": 1},                   # adversarial
        {"grad_matching": True},                       # 2nd-order
        {"strength_contrasting": True},                # weak-vs-strong rank
    ])
    def test_step_runs_and_loss_finite(self, kwargs):
        import optax
        module, params = _tiny_extractor()
        opt = optax.adamw(1e-4)
        step = make_train_step(module, "bt_nll", opt, **kwargs)
        rng = np.random.default_rng(5)
        imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        imgs_w = np.clip(imgs + 0.05, 0, 1)
        # the step donates params/opt_state buffers — snapshot before
        before = jax.tree_util.tree_map(np.asarray, params)
        params2, _, logs = step(params, opt.init(params),
                                {"imgs": imgs, "imgs_w": imgs_w},
                                jax.random.PRNGKey(0))
        assert np.isfinite(float(logs["loss"]))
        if kwargs.get("grad_matching"):
            assert np.isfinite(float(logs["loss_2ndorder"]))
        if kwargs.get("strength_contrasting"):
            assert np.isfinite(float(logs["loss_wm_contrasting"]))
        # params actually moved
        moved = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b[0] - b[1]))),
            jax.tree_util.tree_map(lambda a, b: (jnp.asarray(a), b),
                                   before, params2),
            0.0)
        assert moved > 0

    def test_loss_decreases_on_fixed_batch(self):
        """A few steps on one batch must reduce the BT loss — the smoke the
        reference's training curve implies (ref train.py:488-520)."""
        import optax
        module, params = _tiny_extractor()
        opt = optax.adamw(3e-3)
        step = make_train_step(module, "bt_nll", opt)
        rng = np.random.default_rng(6)
        imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        batch = {"imgs": imgs,
                 "imgs_w": np.clip(imgs + rng.normal(0, 0.04, imgs.shape)
                                   .astype(np.float32), 0, 1)}
        opt_state = opt.init(params)
        losses = []
        for i in range(8):
            params, opt_state, logs = step(params, opt_state, batch,
                                           jax.random.PRNGKey(i))
            losses.append(float(logs["loss"]))
        assert losses[-1] < losses[0], losses


class TestOptimizeImage:
    def test_ascent_raises_score(self):
        """optimize() must raise the preference score of the image
        (ref optimize_image.py:40-47); residual = original - cleaned."""
        from videoseal_tpu.wmforger.optimize_image import (get_watermark,
                                                           optimize)
        module, params = _tiny_extractor()
        rng = np.random.default_rng(7)
        img = rng.uniform(0.2, 0.8, (32, 32, 3)).astype(np.float32)

        def score(x):
            return float(module.apply({"params": params},
                                      jnp.asarray(x)[None])[..., 0].mean())

        out = optimize(img, module, params, num_steps=10, lr=0.05)
        assert out.shape == img.shape
        assert score(out) > score(img)
        cleaned, watermark = get_watermark(img, out)
        np.testing.assert_allclose(cleaned + watermark, img, atol=1e-6)


class TestCLI:
    def test_two_step_smoke(self, tmp_path):
        out = tmp_path / "ck.npz"
        wmforger_main(["--steps", "2", "--synthetic", "1", "--tiny", "1",
                       "--img_size", "64", "--batch_size", "2", "--cpu", "1",
                       "--output", str(out)])
        assert out.exists()
        z = np.load(out)
        assert len(z.files) > 0
        assert all(np.isfinite(z[f]).all() for f in z.files)
