"""Pose heatmap rendering parity vs independent numpy/scipy oracles
(reference logic: CC/.../pose_utils.py:52-70 and FD/.../preprocessor.py:114-131)."""

import numpy as np
from scipy import ndimage

from reid_gan_tpu.ops.pose import cords_to_map, render_pose_peaks


def _ref_cords_to_map(cords, img_size, old_size, sigma=6):
    """numpy oracle mirroring CC pose_utils.cords_to_map (returns K,H,W)."""
    cords = cords.astype(float).copy()
    result = np.zeros((cords.shape[0],) + img_size, dtype="float32")
    for i, point in enumerate(cords):
        if point[0] == -1 or point[1] == -1:
            continue
        p0 = int(point[0] / old_size[0] * img_size[0])
        p1 = int(point[1] / old_size[1] * img_size[1])
        xx, yy = np.meshgrid(np.arange(img_size[1]), np.arange(img_size[0]))
        result[i] = np.exp(-((yy - p0) ** 2 + (xx - p1) ** 2) / (2 * sigma ** 2))
    return result


def test_cords_to_map_parity():
    rng = np.random.RandomState(0)
    cords = np.stack([rng.randint(0, 128, 18), rng.randint(0, 64, 18)], 1).astype(np.float32)
    cords[3] = -1
    old_size = np.array([128.0, 64.0])
    ours = np.asarray(cords_to_map(cords, old_size, height=128, width=64, sigma=6.0))
    ref = _ref_cords_to_map(cords, (128, 64), (128.0, 64.0))
    assert ours.shape == (18, 128, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cords_to_map_rescaling():
    cords = np.array([[64.0, 32.0]] + [[-1.0, -1.0]] * 17, np.float32)
    old_size = np.array([128.0, 64.0])
    ours = np.asarray(cords_to_map(cords, old_size, height=64, width=32, sigma=6.0))
    ref = _ref_cords_to_map(cords, (64, 32), (128.0, 64.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours[1].max() == 0.0


def test_render_pose_peaks_vs_scipy_interior():
    """Delta + gaussian_filter + /max == truncated analytic Gaussian away from
    borders (FD preprocessor semantics)."""
    h, w, sigma = 64, 64, 5.0
    lm = np.array([[32.0, 30.0]] + [[-1.0, -1.0]] * 17, np.float32)
    ours = np.asarray(render_pose_peaks(lm, height=h, width=w, sigma=sigma))
    delta = np.zeros((h, w))
    delta[32, 30] = 1.0
    ref = ndimage.gaussian_filter(delta, sigma=sigma)
    ref = ref / ref.max()
    np.testing.assert_allclose(ours[0], ref, atol=1e-4)
    assert np.all(ours[1:] == 0.0)


def test_render_pose_peaks_erase():
    lm = np.stack([np.full(18, 20.0), np.full(18, 20.0)], 1)
    ours = np.asarray(render_pose_peaks(lm, height=48, width=48, sigma=5.0, erase_index=4))
    assert np.all(ours[4] == 0.0)
    assert ours[3].max() == 1.0
