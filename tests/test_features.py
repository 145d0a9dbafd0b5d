"""Feature extraction tests: FAST detection, orientation, BRIEF invariance."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.features.extractor import (
    ExtractorConfig,
    extract,
    level_budgets,
)
from orb_slam3_modified_tpu.ops.brief import brief_descriptors
from orb_slam3_modified_tpu.ops.fast import fast_score_map
from orb_slam3_modified_tpu.ops.hamming import hamming_matrix, hamming_pairs
from orb_slam3_modified_tpu.ops.image import gaussian_blur
from orb_slam3_modified_tpu.ops.orientation import ic_angles


def checkerboard(h=128, w=128, sq=16):
    ys, xs = np.mgrid[:h, :w]
    return (((ys // sq) + (xs // sq)) % 2 * 255.0).astype(np.float32)


def textured_image(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    import jax.image

    return np.asarray(jax.image.resize(jnp.asarray(img), (h, w), "cubic"))


class TestFast:
    def test_detects_corners_on_isolated_squares(self):
        # isolated bright squares on dark bg: their corners are L-junctions,
        # which FAST-9 fires on (checkerboard X-junctions correctly don't).
        img = np.zeros((128, 128), np.float32)
        for y in range(16, 112, 32):
            for x in range(16, 112, 32):
                img[y : y + 12, x : x + 12] = 255.0
        resp = fast_score_map(jnp.asarray(img), 20.0)
        n = int(jnp.sum(resp > 0))
        assert n >= 16, f"{n} corner pixels"

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        resp = fast_score_map(img, 7.0)
        assert int(jnp.sum(resp > 0)) == 0

    def test_single_bright_dot(self):
        img = jnp.zeros((32, 32)).at[16, 16].set(255.0)
        resp = fast_score_map(img, 20.0)
        # the dot itself is a "dark ring" corner? a single pixel is smaller
        # than the ring; its neighbors see mixed rings. Just assert finite.
        assert np.isfinite(np.asarray(resp)).all()


class TestOrientation:
    def test_gradient_orientation(self):
        # horizontal intensity ramp -> centroid along +x -> angle ~ 0
        img = jnp.tile(jnp.arange(64, dtype=jnp.float32)[None, :], (64, 1))
        ang = ic_angles(img, jnp.array([32]), jnp.array([32]))
        assert abs(float(ang[0])) < 0.05
        # vertical ramp -> angle ~ pi/2
        img2 = jnp.tile(jnp.arange(64, dtype=jnp.float32)[:, None], (1, 64))
        ang2 = ic_angles(img2, jnp.array([32]), jnp.array([32]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.05


class TestBrief:
    def test_deterministic(self):
        img = jnp.asarray(textured_image())
        b = gaussian_blur(img)
        ys = jnp.array([50, 100, 150])
        xs = jnp.array([60, 120, 200])
        ang = jnp.zeros(3)
        d1 = brief_descriptors(b, ys, xs, ang)
        d2 = brief_descriptors(b, ys, xs, ang)
        assert np.array_equal(np.asarray(d1), np.asarray(d2))

    def test_distinct_points_distinct_descriptors(self):
        img = jnp.asarray(textured_image())
        b = gaussian_blur(img)
        ys = jnp.array([50, 100, 150, 200])
        xs = jnp.array([60, 120, 200, 100])
        d = brief_descriptors(b, ys, xs, jnp.zeros(4))
        dm = np.asarray(hamming_matrix(d, d))
        off = dm[~np.eye(4, dtype=bool)]
        assert (np.diag(dm) == 0).all()
        assert off.min() > 60  # random patches -> ~128 expected

    def test_rotation_invariance(self):
        """Descriptor computed with the patch's own orientation should be
        stable when the image is rotated 90 degrees."""
        img = textured_image(256, 256, seed=3)
        b = np.asarray(gaussian_blur(jnp.asarray(img)))
        # rotate image 90deg CCW: (y, x) -> (x, H-1-y)
        img_rot = np.rot90(img, k=1).copy()
        b_rot = np.asarray(gaussian_blur(jnp.asarray(img_rot)))
        pts = [(100, 120), (140, 90), (180, 160)]
        h = img.shape[0]
        ys = jnp.array([p[0] for p in pts])
        xs = jnp.array([p[1] for p in pts])
        ang = ic_angles(jnp.asarray(img), ys, xs)
        d1 = brief_descriptors(jnp.asarray(b), ys, xs, ang)
        # rotated coords: y' = (W-1) - x ... np.rot90 CCW: out[i, j] = in[j, W-1-i]
        # so in(y, x) -> out(W-1-x, y)
        w = img.shape[1]
        ys_r = jnp.array([w - 1 - p[1] for p in pts])
        xs_r = jnp.array([p[0] for p in pts])
        ang_r = ic_angles(jnp.asarray(img_rot), ys_r, xs_r)
        d2 = brief_descriptors(jnp.asarray(b_rot), ys_r, xs_r, ang_r)
        dist = np.asarray(hamming_pairs(d1, d2))
        assert dist.max() < 80, f"rotated distances {dist}"


class TestExtractor:
    def test_budgets_sum(self):
        cfg = ExtractorConfig(n_features=1000)
        assert sum(level_budgets(cfg)) == 1000

    def test_extract_textured(self):
        img = jnp.asarray(textured_image(480, 640, seed=1))
        cfg = ExtractorConfig(n_features=500)
        f = extract(img, cfg)
        n_valid = int(jnp.sum(f.valid))
        assert f.capacity == 500
        assert n_valid > 300, f"only {n_valid} features"
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 640).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 480).all()
        # spatial spread: features should cover at least half the image cells
        gx = np.clip((uv[:, 0] // 80).astype(int), 0, 7)
        gy = np.clip((uv[:, 1] // 80).astype(int), 0, 5)
        occupied = len(set(zip(gx, gy)))
        assert occupied >= 24, f"features concentrated: {occupied}/48 cells"

    def test_multiscale(self):
        img = jnp.asarray(textured_image(480, 640, seed=2))
        f = extract(img, ExtractorConfig(n_features=600))
        lv = np.asarray(f.level)[np.asarray(f.valid)]
        assert lv.max() >= 4  # coarse levels populated
