import numpy as np

from tpucdc.eval import (FIDAccumulator, PerceptualMetric, frechet_distance,
                         ms_ssim, psnr)


def _img(seed, h=128, w=128):
    return np.random.default_rng(seed).integers(
        0, 255, size=(h, w, 3), dtype=np.uint8)


def test_psnr_identity_and_ordering():
    a = _img(0)
    assert psnr(a, a) > 80
    noisy1 = np.clip(a.astype(int) + np.random.default_rng(1).integers(
        -5, 6, a.shape), 0, 255).astype(np.uint8)
    noisy2 = np.clip(a.astype(int) + np.random.default_rng(2).integers(
        -40, 41, a.shape), 0, 255).astype(np.uint8)
    assert psnr(a, noisy1) > psnr(a, noisy2) > 0


def test_psnr_known_value():
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.full((16, 16, 3), 10, np.uint8)
    # MSE=100 → PSNR = 10 log10(255²/100) ≈ 28.13 dB.
    assert abs(psnr(a, b) - 28.1308) < 1e-3


def test_ms_ssim_bounds_and_ordering():
    a = _img(3, 192, 192)
    assert ms_ssim(a, a) > 0.999
    blurry = a.astype(np.float32)
    blurry = (blurry + np.roll(blurry, 1, 0) + np.roll(blurry, 1, 1)) / 3
    s_blur = ms_ssim(a, blurry.astype(np.uint8))
    s_rand = ms_ssim(a, _img(4, 192, 192))
    assert 0 < s_rand < s_blur < 1.0


def test_ms_ssim_small_images_adapt_levels():
    a = _img(5, 32, 32)
    assert 0 < ms_ssim(a, a) <= 1.0 + 1e-6


def test_gmsd_identity_and_ordering():
    from tpucdc.eval import gmsd
    a = _img(6, 192, 192)
    assert gmsd(a, a) < 1e-4          # identical → 0 (lower is better)
    mild = np.clip(a.astype(int) + np.random.default_rng(7).integers(
        -8, 9, a.shape), 0, 255).astype(np.uint8)
    heavy = np.clip(a.astype(int) + np.random.default_rng(8).integers(
        -60, 61, a.shape), 0, 255).astype(np.uint8)
    g_mild, g_heavy = gmsd(a, mild), gmsd(a, heavy)
    assert 0 < g_mild < g_heavy < 1.0
    # Structural damage (blur kills gradients) scores worse than mild noise.
    blurry = a.astype(np.float32)
    for _ in range(4):
        blurry = (blurry + np.roll(blurry, 1, 0) + np.roll(blurry, 1, 1)) / 3
    assert gmsd(a, blurry.astype(np.uint8)) > g_mild
    # Batched [B,H,W,C] input matches the single-image value at B=1.
    assert abs(gmsd(a[None], mild[None]) - g_mild) < 1e-6


def test_perceptual_metric():
    m = PerceptualMetric()
    assert m.kind in ("lpips", "lpips-random-proxy")
    a = _img(6)
    assert m(a, a) < 1e-6
    d_small = m(a, np.clip(a.astype(int) + 3, 0, 255).astype(np.uint8))
    d_big = m(a, _img(7))
    assert d_small < d_big


def test_fid_zero_for_same_distribution():
    mu = np.zeros(4)
    cov = np.eye(4)
    assert frechet_distance(mu, cov, mu, cov) < 1e-6
    assert frechet_distance(mu, cov, mu + 1, cov) > 3.9


def test_fid_accumulator():
    acc = FIDAccumulator()
    rng = np.random.default_rng(0)
    real = rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8)
    acc.add("real", real)
    acc.add("fake", real)                      # identical sets → FID ≈ 0
    assert abs(acc.compute()) < 0.01           # sqrtm eps-jitter noise
    acc2 = FIDAccumulator()
    acc2.add("real", real)
    acc2.add("fake", rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8))
    assert acc2.compute() > acc.compute() - 1e-9


def test_real_weights_npz_path(tmp_path, monkeypatch):
    """VERDICT r1 item 8: cover the real-weights .npz branch (the code path
    that matters the moment real VGG-LPIPS weights land) with a tiny
    synthetic weight file, and check labels stay truthful end to end."""
    rng = np.random.default_rng(3)
    channels = (4, 6, 8, 8, 8)
    blob = {}
    cin = 3
    for i, cout in enumerate(channels):
        blob[f"conv{i}_kernel"] = rng.normal(
            size=(3, 3, cin, cout)).astype(np.float32)
        blob[f"conv{i}_bias"] = np.zeros(cout, np.float32)
        blob[f"lin{i}"] = np.abs(rng.normal(size=cout)).astype(np.float32)
        cin = cout
    path = tmp_path / "lpips_tiny.npz"
    np.savez(path, **blob)

    m = PerceptualMetric(weights_path=str(path))
    assert m.kind == "lpips"
    a = _img(11)
    assert m(a, a) < 1e-6
    assert m(a, _img(12)) > m(a, a)

    # FID real-features branch picks the weights up via the env var and
    # reports the truthful feature kind (not "inception").
    monkeypatch.setenv("TPUCDC_LPIPS_WEIGHTS", str(path))
    acc = FIDAccumulator()
    assert acc.extractor.kind == "vgg-lpips"
    imgs = np.stack([_img(s) for s in range(4)])
    acc.add("real", imgs)
    acc.add("fake", imgs)
    assert abs(acc.compute()) < 0.01


def test_ms_ssim_bounded_and_matches_f64_reference():
    """r2 regression: the uncentered f32 moment form overshot 1 (observed
    1.0063 on a high-rate recon). Compare against a float64 numpy reference
    on a realistic correlated pair and assert the [0, 1+eps] bound."""
    import numpy as np
    from tpucdc.eval.metrics import ms_ssim, _gaussian_kernel

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (64, 96, 3))
    smooth = base
    for _ in range(3):   # cheap blur → natural-image-like correlation
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)) / 3
    a = smooth.astype(np.float32)
    b = (smooth + rng.normal(0, 6, smooth.shape)).clip(0, 255).astype(
        np.float32)

    def ssim_ref(a, b, peak=255.0):     # single-scale, float64
        k = np.asarray(_gaussian_kernel(), np.float64)
        from scipy.signal import convolve2d
        c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
        ssims, css = [], []
        for ch in range(a.shape[-1]):
            x = a[..., ch].astype(np.float64)
            y = b[..., ch].astype(np.float64)
            f = lambda im: convolve2d(im, k, mode="valid")
            mx, my = f(x), f(y)
            sxx, syy = f(x * x) - mx * mx, f(y * y) - my * my
            sxy = f(x * y) - mx * my
            lum = (2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)
            cs = (2 * sxy + c2) / (sxx + syy + c2)
            ssims.append(np.mean(lum * cs))
            css.append(np.mean(cs))
        return float(np.mean(ssims)), float(np.mean(css))

    # identical images → exactly 1
    assert abs(ms_ssim(a, a) - 1.0) < 1e-5
    got = ms_ssim(a, b)
    assert got <= 1.0 + 1e-5, got
    # single-level comparison against the f64 reference (64px → our
    # adaptive ms_ssim uses >1 level; compare via a 16px crop = 1 level)
    crop_a, crop_b = a[:20, :20], b[:20, :20]
    ref_ssim, _ = ssim_ref(crop_a, crop_b)
    got_crop = ms_ssim(crop_a, crop_b)
    assert abs(got_crop - ref_ssim) < 2e-3, (got_crop, ref_ssim)
