import numpy as np
import cv2
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import fast, select

RNG = np.random.default_rng(2)


def checkerboard_image(h=96, w=128):
    img = np.full((h, w), 120, np.uint8)
    img[20:40, 30:50] = 220
    img[60:80, 80:110] = 30
    img += (RNG.random((h, w)) * 3).astype(np.uint8)
    return img


def natural_like_image(h=120, w=160):
    img = (RNG.random((h, w)) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


def cv2_fast_set(img, threshold, nms=True):
    det = cv2.FastFeatureDetector_create(threshold=int(threshold), nonmaxSuppression=nms,
                                         type=cv2.FastFeatureDetector_TYPE_9_16)
    kps = det.detect(img, None)
    return {(int(round(k.pt[0])), int(round(k.pt[1]))) for k in kps}


def ours_fast_set(img, threshold, nms=True):
    s = np.asarray(fast.detect(jnp.asarray(img), float(threshold), nms=nms))
    ys, xs = np.nonzero(s)
    return {(int(x), int(y)) for x, y in zip(xs, ys)}


def test_fast_positions_match_cv2_no_nms():
    img = checkerboard_image()
    ours = ours_fast_set(img, 20, nms=False)
    cvs = cv2_fast_set(img, 20, nms=False)
    # cv2 also masks a 3px border; compare interior detections.
    inter = ours & cvs
    assert len(cvs) > 20
    # Dense formulation must agree with OpenCV nearly exactly.
    assert len(inter) / max(len(cvs), 1) > 0.98, (len(ours), len(cvs), len(inter))
    assert len(ours - cvs) <= 0.02 * len(ours) + 2


def test_fast_positions_match_cv2_with_nms():
    img = natural_like_image()
    ours = ours_fast_set(img, 15, nms=True)
    cvs = cv2_fast_set(img, 15, nms=True)
    assert len(cvs) > 10
    inter = ours & cvs
    # NMS tie-breaking differs slightly; demand high overlap.
    assert len(inter) / max(len(cvs), 1) > 0.9, (len(ours), len(cvs), len(inter))


def test_fast_flat_image_no_corners():
    img = np.full((64, 64), 128, np.uint8)
    assert ours_fast_set(img, 10) == set()


def test_top_k_keypoints():
    img = checkerboard_image()
    s = fast.detect(jnp.asarray(img), 20.0)
    xy, scores, valid = select.top_k_keypoints(s, 64)
    n_det = int(np.count_nonzero(np.asarray(s)))
    assert int(valid.sum()) == min(64, n_det)
    sn = np.asarray(s)
    for (x, y), sc, v in zip(np.asarray(xy), np.asarray(scores), np.asarray(valid)):
        if v:
            assert sn[int(y), int(x)] == sc


def test_grid_top_k_uniformity():
    # Dense corners in one quadrant must not starve other cells.
    img = np.full((128, 128), 100, np.uint8)
    for i in range(10, 60, 6):
        for j in range(10, 60, 6):
            img[i:i+2, j:j+2] = 250
    img[100:104, 100:104] = 0  # single isolated corner elsewhere
    s = fast.detect(jnp.asarray(img), 20.0)
    xy, sc, valid = select.grid_top_k(s, 64, cell=32, k_per_cell=4)
    xy = np.asarray(xy)[np.asarray(valid)]
    # The isolated corner region must be represented.
    assert np.any((xy[:, 0] > 90) & (xy[:, 1] > 90))
    # Per-cell cap respected.
    cells = {}
    for x, y in xy:
        cells.setdefault((int(x)//32, int(y)//32), 0)
        cells[(int(x)//32, int(y)//32)] += 1
    assert max(cells.values()) <= 4
